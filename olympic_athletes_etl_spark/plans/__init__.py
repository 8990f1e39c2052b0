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
# FRESH driver row this round (round 8 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"; prior rounds' prefixes
# live there and in git history):
#   1. the three NEW queries this round (the stored-index family):
#      s_knn_graph_stored — the
#      stored-graph incremental path (build raw → knn_graph_store
#      parquet → knn_graph_load → merge the batch), gated on
#      s_knn_graph_incr's oracle so the store/load round trip is proven
#      lossless by the hash itself — and s_ann_ivfpq_stored — the
#      DEPLOYED IVFPQ shape (encode once into a list_id-partitioned
#      parquet index; serve via driver-side coarse quantization →
#      literal partition filter → ADC from stored codes → exact
#      re-rank), gated on s_ann_ivfpq's oracle so the whole
#      build→store→serve loop is hash-proven — and d_neardup_stored —
#      near-dup screening of an incoming batch against PERSISTED
#      band-partitioned MinHash postings (the batch re-shingles only
#      itself; the corpus side is a narrow columnar read), gated on an
#      oracle that recomputes the split band join from text. (The
#      train/serve — plus s_ann_ivf_sampled, the sampled-training
#      demonstration (fit on vec_id % 4 == 0, assign + search over
#      everything), gated on its own mod-4 unrolled oracle so the
#      sampled fit's cross-engine bit-identity is driver-proven — and
#      t_char_pair_freq, BPE's iteration-0 statistic (corpus-weighted
#      adjacent char-pair counts), which hash-gates the distributed
#      word-count + pair-explode machinery under the new
#      bpe_learn_merges tokenizer trainer (the merge LOOP itself has
#      data-dependent literals, so it is pinned by exact equality with
#      a pure-Python reference in test_round8_ops instead). (The
#      train/serve
#      refactors of s_ann_ivf_kmeans / s_ann_pq / s_ann_ivfpq /
#      s_knn_graph_ivf are pure factorings — same plan, same output —
#      and need no re-audit, though the first two sit in the ledger
#      rotation anyway);
#   2. the pre-generated oldest-first r8 rotation from the COVERAGE.md
#      freshness ledger (the r3-stale textstats/dedup slots rolled from
#      r7, s_ann_ivf_kmeans / s_kmeans_clusters / s_ann_pq /
#      s_dim_profile, the r3-stale events queries, r_scd2_intervals,
#      m_resize_plan / m_payload_dedup, the six tpch_close queries, the
#      r3-stale relational/f_* slots, then r4 residue) — minus its last
#      five entries (t_quality_funnel, t_sequence_pack,
#      d_jaccard_histogram, d_containment_pairs, d_dup_rate_by_source —
#      displaced by the new registrations and rolled to the front of
#      the r9 rotation).
# Prefix math (driver audits 50): 5 + 45 = exactly 50. Everything
# demoted stays covered locally by tools/check_parity.py regardless of
# order.
NEW_PLANS_R8 = [
    "s_knn_graph_stored",
    "s_ann_ivfpq_stored",
    "d_neardup_stored",
    "s_ann_ivf_sampled",
    "t_char_pair_freq",
]
STALE_LEDGER_R8 = [
    # r3-stale textstats (rolled from the r7 rotation)
    "t_balanced_sample",
    "t_corpus_prep",
    "t_idf",
    "t_chunk_split",
    "t_ngram_freq",
    "t_pii_scrub",
    "t_unigram_commonness",
    "t_chunk_overlap",
    # r3-stale dedup
    "d_simhash_wide",
    "d_contamination",
    "d_minhash_estimate",
    "d_substring_dup",
    "d_incremental_dedup",
    "d_cluster_canonical",
    # r3-stale similarity (s_ann_ivf_kmeans / s_ann_pq additionally
    # carry this round's train/serve factoring — fresh rows re-prove
    # the refactor changed nothing)
    "s_ann_ivf_kmeans",
    "s_kmeans_clusters",
    "s_ann_pq",
    "s_dim_profile",
    # r3-stale events
    "e_sessionize",
    "e_rolling_1h",
    "e_transition_matrix",
    "e_value_histogram",
    "e_gap_days",
    "e_late_arrivals",
    "e_dow_hour_profile",
    # r3-stale relational/multimodal
    "r_scd2_intervals",
    "m_resize_plan",
    "m_payload_dedup",
    # r3-stale tpch_close
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_stock",
    "q16_part_supplier_count",
    "q20_excess_stock",
    "q21_waiting_suppliers",
    # r3-stale relational core / f_* slots
    "f_project_rename",
    "f_notnull_filter",
    "f_neq_null_semantics",
    "f_anti_join_resume",
    "a_grouping_sets",
    "r_unpivot_metrics",
    "a_table_profile",
    "j_full_outer_recon",
    "a_intersect_keys",
    "j_salted_enrich",
    "w_ntile_deciles",
    # r4 residue (t_quality_funnel + t_sequence_pack +
    # d_jaccard_histogram + d_containment_pairs + d_dup_rate_by_source
    # rolled to the r9 front, displaced by the round's five new
    # registrations)
]
AUDIT_PREFIX = NEW_PLANS_R8 + STALE_LEDGER_R8

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]
