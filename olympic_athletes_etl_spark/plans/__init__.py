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
# FRESH driver row this round (round 4):
#   1. plans CHANGED this round — the e_peak_concurrency /
#      e_user_pareto partitioned rewrites, the e_burst_minutes
#      dead-air fix, the r_dim_bridge hash-stable word_id — must be
#      re-audited under their new oracles;
#   2. the 20 remaining round-3 late additions that have never had a
#      driver row (verified locally + by the round-3 judge only);
#   3. queries NEW this round (no driver row yet);
#   4. the r1-stale core: all of textops (11) and tpch (5) — driver-green
#      in r1 but never re-checked since.
# Prefix math (driver audits 50): 4 changed + 20 never-audited + 23 new
# + 3 late-round-4 additions (g_pagerank / a_hll_estimate / t_bm25_rank
# — brand-new families: iterative graph, HLL sketch, retrieval scoring)
# = exactly 50. The remaining late additions (q_skyline_parts,
# q_association_rules, e_time_weighted_avg), all 11 textops, all 5
# tpch-core, and all of relational (r1-stale) rotate first in round 5
# (recorded in COVERAGE.md). Everything demoted stays covered locally
# by tools/check_parity.py regardless of order.
_CHANGED_THIS_ROUND = [
    "e_peak_concurrency",
    "e_user_pareto",
    "e_burst_minutes",
    "r_dim_bridge",
]
_NEVER_AUDITED = [
    "d_containment_pairs",
    "d_dup_rate_by_source",
    "d_jaccard_histogram",
    "d_novelty_by_doc",
    "d_shingle_df_histogram",
    "e_bot_suspects",
    "e_inter_event_time",
    "e_session_durations",
    "e_type_mix_daily",
    "e_user_growth",
    "e_weekly_active_users",
    "q_copurchase_pairs",
    "q_nation_trade_balance",
    "q_order_lifecycle",
    "q_revenue_trend_mom",
    "q_supplier_hhi",
    "s_bucket_stats",
    "s_knn_batch",
    "t_quality_funnel",
    "v_fk_integrity",
]
_NEW_THIS_ROUND = [
    "u_noc_df",
    "m_image_decode",
    "d_fuzzy_block_join",
    "d_fuzzy_dedup",
    "t_sequence_pack",
    "d_semantic_dedup",
    "e_retention_cohorts",
    "e_funnel_conversion",
    "j_range_band_join",
    "m_audio_decode",
    "a_cardinality_sketch",
    "t_heavy_hitters",
    "r_zorder_layout",
    "d_bloom_prefilter",
    "a_histogram_median",
    "g_triangle_count",
    "g_degree_histogram",
    "a_corr_regression",
    "e_anomaly_days",
    "e_ohlc_bars",
    "t_mix_schedule",
    "s_centroid_outliers",
    "v_histogram_drift",
    # late round-4 additions (one driver slot per new family)
    "g_pagerank",
    "a_hll_estimate",
    "t_bm25_rank",
]
_STALE_CORE_MODULES = (textops, tpch, relational)


def _module_query_names(mod) -> list[str]:
    return [n for n, fn in queries().items() if fn.__module__ == mod.__name__]


_explicit = _CHANGED_THIS_ROUND + _NEVER_AUDITED + [
    n for n in _NEW_THIS_ROUND if n in queries()
]
_promote(
    _explicit
    + [
        n
        for m in _STALE_CORE_MODULES
        for n in _module_query_names(m)
        if n not in _explicit
    ]
)

__all__ = ["queries", "oracle_sql", "query"]
