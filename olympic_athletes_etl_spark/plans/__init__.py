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
# FRESH driver row this round (round 13 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"; prior rounds' prefixes
# live there and in git history). Round 13:
#   0. the 5 CHANGED-ORACLE queries take the first driver rows per the
#      standing changed-plans-first rule: d_embedding_neardup (corpus-
#      sized banding — new plan AND oracle), q1_pricing_summary (exact
#      integer money avgs), q_order_share_window (integer-unit window
#      share), t_bpe_encode_fixed/arrow (enc CTE materialized in the
#      oracle after the sf10 mmap-exhaustion diagnosis);
#   1. the r12 verdict's pre-generated r13 prefix, oldest-first,
#      starting with the displaced q6_forecast_revenue — it includes
#      q22_idle_customers, whose threshold this round also moved to
#      exact integers, so that change is audited in its suggested slot.
# Prefix math (driver audits 50): 5 changed + 45 = exactly 50 — the
# five least-stale tail entries of the suggested list
# (q2_min_cost_supplier, q9_product_profit, q11_important_stock,
# q16_part_supplier_count, q20_excess_stock) roll to the r14 front.
# Everything demoted stays covered locally by tools/check_parity.py
# regardless of order (the r13 sweeps run at this final registry).
CHANGED_PLANS_R13 = [
    "d_embedding_neardup",
    "q1_pricing_summary",
    "q_order_share_window",
    "t_bpe_encode_fixed",
    "t_bpe_encode_arrow",
]
STALE_LEDGER_R13 = [
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
    "t_balanced_sample",
    "t_corpus_prep",
    "t_idf",
    "t_chunk_split",
    "t_ngram_freq",
    "t_pii_scrub",
    "t_unigram_commonness",
    "t_chunk_overlap",
    "t_char_pair_freq",
    "d_simhash_wide",
    "d_contamination",
    "d_minhash_estimate",
    "d_substring_dup",
    "d_incremental_dedup",
    "d_cluster_canonical",
    "s_ann_ivf_kmeans",
    "s_ann_ivf_sampled",
    "s_kmeans_clusters",
    "s_ann_pq",
    "s_ann_ivfpq_stored",
    "s_knn_graph_stored",
    "s_dim_profile",
    "d_neardup_stored",
    "e_sessionize",
    "e_rolling_1h",
    "e_transition_matrix",
    "e_value_histogram",
    "e_gap_days",
    "e_late_arrivals",
    "e_dow_hour_profile",
    "r_scd2_intervals",
    "m_resize_plan",
    "m_payload_dedup",
    # (q2_min_cost_supplier, q9_product_profit, q11_important_stock,
    #  q16_part_supplier_count, q20_excess_stock displaced by the
    #  changed-plan slots, rolled to the r14 front)
]
AUDIT_PREFIX = CHANGED_PLANS_R13 + STALE_LEDGER_R13

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]

