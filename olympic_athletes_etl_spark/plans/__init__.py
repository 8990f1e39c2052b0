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
# FRESH driver row this round (round 12 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"; prior rounds' prefixes
# live there and in git history). Round 12:
#   0. the NEW registration (d_sentence_dedup — the CCNet/RefinedWeb
#      cross-doc sentence/line-dedup pass) takes the first driver row
#      per the standing new-queries-first rule;
#   1. the r11 verdict's pre-generated r12 prefix, oldest-first: the
#      C-family scalar pipelines + the r6/r7-stale text-lifecycle,
#      dedup/similarity, events, multimodal, validation and TPC-H
#      residue (c_regex_clean … q4_priority_late_ship).
# Prefix math (driver audits 50): 1 new + 49 = exactly 50 — the
# suggested-r12 tail entry q6_forecast_revenue is displaced by the new
# registration and rolls to the r13 front. Everything demoted stays
# covered locally by tools/check_parity.py regardless of order (the
# r12 sweeps run at this final registry). After this round the oldest
# driver row registry-wide is r7; whole-registry freshness <=2 rounds
# is reached once the r13 rotation clears the residue.
NEW_PLANS_R12 = [
    "d_sentence_dedup",
]
STALE_LEDGER_R12 = [
    "c_regex_clean",
    "c_regex_extract",
    "c_split_element",
    "c_concat_label",
    "c_rlike_flag",
    "c_date_parse",
    "c_conditional_bucket",
    "c_coalesce_impute",
    "c_math_ratio",
    "c_length_check",
    "c_cross_col_dates",
    "t_token_count",
    "t_quality_score",
    "t_lang_id",
    "t_fingerprint",
    "t_bpe_token_count",
    "t_stratified_sample",
    "t_train_test_split",
    "t_token_pack",
    "t_gopher_quality",
    "t_source_mix",
    "d_embedding_neardup",
    "d_simhash_banded",
    "d_dup_clusters_star",
    "d_neardup_pipeline",
    "s_ann_lsh",
    "s_ann_lsh_multiprobe",
    "s_ann_ivfpq",
    "s_knn_graph",
    "s_knn_graph_multiprobe",
    "s_knn_graph_ivf",
    "s_knn_graph_incr",
    "s_bucket_stats",
    "s_list_stats",
    "s_graph_recall",
    "e_tumbling_window",
    "e_latest_per_key",
    "e_json_extract",
    "e_sliding_window",
    "e_asof_join",
    "e_range_join_buckets",
    "e_funnel",
    "e_cohort_retention",
    "e_value_outliers",
    "m_byte_features",
    "m_frame_energy",
    "v_rule_summary",
    "v_failure_cases",
    "q4_priority_late_ship",
    # (q6_forecast_revenue displaced by the NEW_PLANS_R12 registration,
    #  rolled to the r13 front)
]
AUDIT_PREFIX = NEW_PLANS_R12 + STALE_LEDGER_R12

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]

