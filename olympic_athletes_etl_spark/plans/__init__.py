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
# FRESH driver row this round (round 7 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"):
#   1. the 7 queries whose plans are NEW or CHANGED this round, so each
#      lands with a fresh driver row under its updated oracle: the
#      decorrelated hyperplane family (the old affine family collapsed
#      256 nominal buckets to ~25 with one 36%-of-corpus hot bucket —
#      see similarity_q._PLANE_W) changes the output of s_ann_lsh,
#      s_ann_lsh_multiprobe, s_bucket_stats, s_knn_graph, and
#      d_embedding_neardup; s_knn_graph additionally gains the
#      per-bucket target cap; s_knn_graph_multiprobe, s_knn_graph_ivf,
#      s_list_stats, and d_dup_clusters_star are newly registered (the
#      multiprobe kNN graph, the learned-inverted-list kNN graph + its
#      occupancy diagnostic, and the large-star/small-star CC scale
#      path); s_knn_graph_incr (incremental graph maintenance),
#      s_graph_recall (the variant-vs-exact recall yardstick), and
#      s_ann_ivfpq (the composed IVF+PQ index) are newly registered
#      late in the round;
#   2. the pre-generated oldest-first r7 rotation from the COVERAGE.md
#      freshness ledger (r2-stale textstats/dedup/events, multimodal,
#      validation, the r2-stale tpch slice, then r3 residue) — minus
#      d_embedding_neardup (already in group 1) and minus the last 10
#      ledger entries (t_chunk_split, t_ngram_freq, t_pii_scrub,
#      t_unigram_commonness, t_chunk_overlap, d_simhash_wide,
#      d_contamination, d_minhash_estimate, then t_corpus_prep, t_idf,
#      and t_balanced_sample displaced by the three late
#      registrations), displaced by the changed-plan group and rolled
#      to the front of the r8 rotation.
# Prefix math (driver audits 50): 12 + 38 = exactly 50. Everything
# demoted stays covered locally by tools/check_parity.py regardless of
# order.
CHANGED_PLANS_R7 = [
    "s_knn_graph",
    "s_knn_graph_multiprobe",
    "s_knn_graph_ivf",
    "s_list_stats",
    "s_ann_lsh",
    "s_ann_lsh_multiprobe",
    "s_bucket_stats",
    "d_embedding_neardup",
    "d_dup_clusters_star",
    "s_knn_graph_incr",
    "s_graph_recall",
    "s_ann_ivfpq",
]
STALE_LEDGER_R7 = [
    # r2-stale textstats
    "t_token_count",
    "t_quality_score",
    "t_lang_id",
    "t_fingerprint",
    "t_bpe_token_count",
    "t_stratified_sample",
    "t_train_test_split",
    "t_token_pack",
    # r2-stale dedup
    "d_simhash_banded",
    "d_neardup_pipeline",
    # r2-stale events
    "e_tumbling_window",
    "e_latest_per_key",
    "e_json_extract",
    "e_sliding_window",
    "e_asof_join",
    "e_range_join_buckets",
    "e_funnel",
    "e_cohort_retention",
    "e_value_outliers",
    # r2-stale multimodal + validation
    "m_byte_features",
    "m_frame_energy",
    "v_rule_summary",
    "v_failure_cases",
    # r2-stale tpch slice
    "q4_priority_late_ship",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q13_order_distribution",
    "q14_promo_share",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_idle_customers",
    "q8_market_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q12_priority_shipping",
    # r3 textstats residue (t_corpus_prep / t_idf / t_balanced_sample
    # rolled to the r8 front, displaced by the three late-round
    # registrations)
    "t_gopher_quality",
    "t_source_mix",
]
AUDIT_PREFIX = CHANGED_PLANS_R7 + STALE_LEDGER_R7

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]
