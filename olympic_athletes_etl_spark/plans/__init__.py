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
# FRESH driver row this round (round 11 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"; prior rounds' prefixes
# live there and in git history). Round 11:
#   0. the NEW registrations (t_unicode_normalize — NFC + mojibake-repair
#      text cleaning; t_doc_entropy — per-doc unigram entropy quality
#      signal; d_url_dedup — URL-canonicalization dedup) take the first
#      driver rows per the standing new-queries-first rule;
#   1. the two entries displaced by the r10 new-query promotions
#      (q_share_hierarchy, a_mad_spend — their latest driver row is r5);
#   2. the remaining r5/r6-stale ledger oldest-first: sketch algebra,
#      graph analytics, text mixtures/BM25, the dedup/similarity core,
#      the TPC-H business tranche, and the joins/aggregates/window/
#      reshape residue (a_sketch_algebra … c_regex_extract).
# Prefix math (driver audits 50): 3 new + 2 + 45 = exactly 50 — the
# suggested-r11 tail entries c_regex_clean / c_regex_extract /
# c_split_element are displaced by the new registrations and roll to
# the r12 front. Everything demoted stays
# covered locally by tools/check_parity.py regardless of order (the
# three r11 sweeps run at this final registry). After this round the
# oldest driver row registry-wide is r6, putting whole-registry
# freshness <=2 rounds in reach at r12.
NEW_PLANS_R11 = [
    "t_unicode_normalize",
    "t_doc_entropy",
    "d_url_dedup",
]
DISPLACED_R10_LEDGER_R11 = [
    "q_share_hierarchy",
    "a_mad_spend",
]
STALE_LEDGER_R11 = [
    "a_sketch_algebra",
    "v_join_size_estimate",
    "g_link_prediction",
    "g_kcore",
    "g_bfs_depth",
    "g_assortativity",
    "t_mix_schedule",
    "t_bm25_rank",
    "t_collocations",
    "d_exact_dup",
    "d_ngram_jaccard",
    "d_dup_clusters",
    "s_knn_bruteforce",
    "s_hybrid_search",
    "v_chi2_experiment",
    "u_noc_canonicalize",
    "flagship_region_top_customers",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q_order_share_window",
    "f_semi_join",
    "j_left_single_key",
    "j_left_composite_key",
    "j_expr_key",
    "j_dynamic_keys_recover",
    "a_mode_per_group",
    "a_group_median",
    "a_distinct_pairs",
    "a_null_profile",
    "a_value_counts",
    "a_collect_sorted",
    "a_dup_detect",
    "a_union_align",
    "a_except_distinct",
    "w_surrogate_key",
    "w_forward_fill",
    "o_topk_per_group",
    "o_ordered_limit",
    "r_explode_split",
    "r_pivot_counts",
    "a_rollup_revenue",
    "a_cube_counts",
    "r_merge_upsert",
    "a_percentiles",
    # (c_regex_clean, c_regex_extract, c_split_element displaced by the
    #  three NEW_PLANS_R11 registrations, rolled to the r12 front)
]
AUDIT_PREFIX = NEW_PLANS_R11 + DISPLACED_R10_LEDGER_R11 + STALE_LEDGER_R11

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]

