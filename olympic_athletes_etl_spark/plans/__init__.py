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
# FRESH driver row this round (round 10 — the rotation recorded in
# COVERAGE.md "Driver audit-prefix rotation log"; prior rounds' prefixes
# live there and in git history). Round 10:
#   0. the two NEW registrations (a_qhist_rollup_stored/range — the
#      quantile-histogram continuous aggregate) take first driver rows;
#   1. the ten queries whose latest driver row is still r4
#      (a_cardinality_sketch … g_pagerank) — the last r4 residue, so
#      after this round the oldest driver row registry-wide is r5;
#   2. the r5-stale tranche (t_feature_hashing … q_abc_analysis), oldest
#      first, covering textstats, dedup/similarity probes, the events
#      analytics family, multimodal hashes, validation scores, the q_*
#      business tranche, and joins/aggregates residue.
# Prefix math (driver audits 50): 2 new + 10 + 38 = exactly 50 — the two
# round-10 registrations (the quantile-histogram continuous aggregate)
# take first driver rows per the standing new-queries-first rule,
# displacing the rotation's last two entries (q_share_hierarchy,
# a_mad_spend → rolled to the r11 front). Everything demoted stays
# covered locally by tools/check_parity.py regardless of order (the
# three r10 sweeps ran at this final registry). The round's other work
# (crash-safe generation-swap compaction, the streaming high-water-mark
# guard, the unified store-lifecycle helper) changes the PHYSICAL store
# layout only — every stored-family gate (d_neardup_stored/compacted,
# s_ann_ivfpq_stored/compacted, r_rollup_stored/slice, t_bm25_stored,
# a_hll_rollup_stored/range, w_dense_id_stored, s_knn_graph_stored)
# keeps its oracle and is re-proven by those sweeps rather than
# consuming fresh driver-prefix slots.
NEW_PLANS_R10 = [
    "a_qhist_rollup_stored",
    "a_qhist_rollup_range",
]
STALE_R4_LEDGER_R10 = [
    "a_cardinality_sketch",
    "t_heavy_hitters",
    "a_histogram_median",
    "a_corr_regression",
    "r_zorder_layout",
    "d_bloom_prefilter",
    "a_hll_estimate",
    "g_degree_histogram",
    "g_triangle_count",
    "g_pagerank",
]
STALE_R5_LEDGER_R10 = [
    "t_feature_hashing",
    "t_keyword_extraction",
    "d_minhash_lsh",
    "d_simhash",
    "s_ann_ivf",
    "s_retrieval_eval",
    "d_jaccard_prefix_filter",
    "d_source_overlap",
    "e_time_weighted_avg",
    "e_cusum_shift",
    "e_dau_mau",
    "e_session_paths",
    "e_repurchase_hazard",
    "e_last_touch_attribution",
    "e_forecast_backtest",
    "e_longest_streak",
    "e_latency_percentiles",
    "e_active_coverage",
    "m_image_ahash",
    "m_image_neardup",
    "v_benford_digits",
    "v_auc_score",
    "v_decile_lift",
    "v_rapid_repeat_orders",
    "q_skyline_parts",
    "q_association_rules",
    "q_cohort_ltv",
    "a_gini_spend",
    "j_pit_features",
    "a_winsorized_stats",
    "r_incremental_agg",
    "j_target_encode",
    "j_negative_sample",
    "q_rfm_segments",
    "q_churn_training_set",
    "w_backward_fill",
    "q_revenue_bridge",
    "q_abc_analysis",
    # (q_share_hierarchy and a_mad_spend displaced by NEW_PLANS_R10,
    # rolled to the r11 front)
]
AUDIT_PREFIX = NEW_PLANS_R10 + STALE_R4_LEDGER_R10 + STALE_R5_LEDGER_R10

_promote(AUDIT_PREFIX)

__all__ = ["queries", "oracle_sql", "query", "AUDIT_PREFIX"]

