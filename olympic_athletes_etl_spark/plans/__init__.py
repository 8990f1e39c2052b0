"""Query registry — the correctness-gated surface of the engine.

Every operator from SURVEY.md §2 is exposed as a named query over the
driver's testdata tables, paired (where SQL-expressible) with a DuckDB
oracle. ``queries()`` / ``oracle_sql()`` aggregate across all plan modules.
"""

from olympic_athletes_etl_spark.plans.registry import oracle_sql, queries, query
from olympic_athletes_etl_spark.plans.registry import promote as _promote

# Import for registration side effects — each module registers its queries.
from olympic_athletes_etl_spark.plans import dedup_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import similarity_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import events_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import multimodal_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import validate_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import udf_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import textstats  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import tpch_extra  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import tpch_close  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import tpch  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import relational  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import textops  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import sketch_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import graph_q  # noqa: E402,F401

# ORDER MATTERS for auditing: the driver's correctness gate samples a prefix
# of the registry (~50 queries), so promote the queries that most need a
# FRESH driver row this round (round 9 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"; prior rounds' prefixes
# live there and in git history):
#   1. the thirteen NEW queries this round: t_bpe_encode_fixed — the fold
#      encoder's semantics gated cross-engine with a FROZEN literal
#      merge list (the DuckDB twin rebuilds greedy left-to-right
#      merging from delimiter-doubled strings + non-overlapping
#      replace — an independent mechanism, so overlap/consumed-symbol
#      drift hash-mismatches) — t_bpe_encode_arrow — the SAME frozen
#      list through the production mapInPandas encoder, sharing that
#      oracle verbatim, so the driver proves Spark fold == Arrow-worker
#      Python fold == delimiter-rewrite SQL on the corpus —
#      s_ivfpq_drift — the quantization-error drift diagnostic for the
#      frozen-quantizer append path, gated through the full
#      train→encode→store→append→load→diagnose loop (exact integer
#      residuals from STORED codes, so the hash also re-proves the code
#      round trip) — d_neardup_within_batch — the batch self-probe
#      that closes the ingest screen's intra-batch blind spot, gated on
#      the oriented band self-join — and the two MAINTAINED-store
#      lifecycles, d_neardup_compacted and s_ann_ivfpq_compacted —
#      store → append → COMPACT → probe/serve, sharing the stored
#      queries' oracles verbatim so the hash proves compaction is an
#      exact rewrite inside the full deployed loop — and
#      w_dense_id — the fact-scale two-phase dense-id path
#      (operators/scale.py:dense_ids: range exchange + per-partition
#      offsets + mapInPandas local index, never a global-order window),
#      gated against the declarative ROW_NUMBER oracle so the driver
#      hash proves the rewrite id-for-id — and the CONTINUOUS-AGGREGATE
#      lifecycle pair: r_rollup_stored (monthly partials stored
#      partitioned by month → batch partials APPENDED → store COMPACTED
#      to one merged row per month → answer SERVED from the store
#      alone, gated on r_incremental_agg's full-recompute oracle) and
#      r_rollup_slice (month-range serve over the uncompacted store —
#      the BETWEEN lands as literal PartitionFilters, and the slice
#      merging per-batch partial rows proves serve correctness is
#      compaction-cadence-independent) — and t_bm25_stored — the text-
#      retrieval index's deployed lifecycle (full postings stored
#      partitioned by token bucket + doc lengths + corpus stats as
#      mergeable partials; ingest batch APPENDED with batch-only
#      tokenization; COMPACTED; then served from the index alone with
#      driver-side term bucketing landing as literal PartitionFilters
#      and df recounted from the read sliver), sharing t_bm25_rank's
#      full-recompute oracle verbatim — and the STORED-SKETCH rollup
#      pair: a_hll_rollup_stored (daily HLL register partials stored
#      partitioned by day, a user-parity batch APPENDED so every day
#      spans both batches and serving MUST max-merge registers,
#      COMPACTED, per-day estimates served from registers alone, gated
#      on a from-raw-events recompute of the integer-exact raw-HLL
#      estimate) and a_hll_rollup_range (distinct users over a 7-day
#      window by merging the stored daily registers — the WAU-from-
#      sketches serve no exact rollup can answer from partials, over
#      the uncompacted store with the day BETWEEN pruning to the
#      window's directories) — and w_dense_id_stored — the
#      identity-column lifecycle (history ids assigned once and stored,
#      an ingest batch appended with ids continuing from the stored max
#      via dense_ids_append, history never renumbered; the key-ordered
#      batch split makes the composed assignment equal the one-shot
#      global ROW_NUMBER, so w_dense_id's oracle gates the whole
#      assign → store → append → serve loop);
#   2. the pre-generated oldest-first r9 rotation from the COVERAGE.md
#      freshness ledger (the r4-stale tranche: the five dedup slots
#      displaced from r8, events, multimodal decodes, u_noc_df, the
#      q_* business tranche, sketches/graph, then r5 residue) — minus
#      its last thirteen entries (t_keyword_extraction, d_minhash_lsh,
#      g_pagerank, t_feature_hashing, g_triangle_count,
#      g_degree_histogram, a_hll_estimate, d_bloom_prefilter,
#      r_zorder_layout, a_corr_regression, a_histogram_median,
#      t_heavy_hitters, a_cardinality_sketch — displaced by the new
#      registrations and rolled to the front of the r10 rotation).
# Prefix math (driver audits 50): 13 + 37 = exactly 50. Everything
# demoted stays covered locally by tools/check_parity.py regardless of
# order.
NEW_PLANS_R9 = [
    "t_bpe_encode_fixed",
    "t_bpe_encode_arrow",
    "s_ivfpq_drift",
    "d_neardup_within_batch",
    "d_neardup_compacted",
    "s_ann_ivfpq_compacted",
    "w_dense_id",
    "r_rollup_stored",
    "r_rollup_slice",
    "t_bm25_stored",
    "a_hll_rollup_stored",
    "a_hll_rollup_range",
    "w_dense_id_stored",
]
STALE_LEDGER_R9 = [
    # r4-stale textstats + the dedup diagnostics displaced from r8
    "t_quality_funnel",
    "t_sequence_pack",
    "d_jaccard_histogram",
    "d_containment_pairs",
    "d_dup_rate_by_source",
    "d_novelty_by_doc",
    "d_shingle_df_histogram",
    "d_fuzzy_block_join",
    "d_fuzzy_dedup",
    "s_knn_batch",
    "s_centroid_outliers",
    "d_semantic_dedup",
    # r4-stale events tranche
    "e_weekly_active_users",
    "e_user_pareto",
    "e_inter_event_time",
    "e_burst_minutes",
    "e_peak_concurrency",
    "e_session_durations",
    "e_user_growth",
    "e_type_mix_daily",
    "e_bot_suspects",
    "e_retention_cohorts",
    "e_funnel_conversion",
    "e_anomaly_days",
    "e_ohlc_bars",
    # r4-stale multimodal decodes + validation + UDF twin
    "m_image_decode",
    "m_audio_decode",
    "v_histogram_drift",
    "u_noc_df",
    # r4-stale q_* business tranche
    "q_revenue_trend_mom",
    "q_order_lifecycle",
    "q_supplier_hhi",
    "q_nation_trade_balance",
    "q_copurchase_pairs",
    "r_dim_bridge",
    "v_fk_integrity",
    "j_range_band_join",
    # r5 residue (a_cardinality_sketch + t_heavy_hitters +
    # a_histogram_median + a_corr_regression + r_zorder_layout +
    # d_bloom_prefilter + a_hll_estimate + g_degree_histogram +
    # g_triangle_count + g_pagerank + t_feature_hashing +
    # t_keyword_extraction + d_minhash_lsh) rolled to the r10 front,
    # displaced by the round's thirteen new registrations
]
AUDIT_PREFIX = NEW_PLANS_R9 + STALE_LEDGER_R9

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]

