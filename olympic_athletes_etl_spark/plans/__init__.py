"""Query registry — the correctness-gated surface of the engine.

Every operator from SURVEY.md §2 is exposed as a named query over the
driver's testdata tables, paired (where SQL-expressible) with a DuckDB
oracle. ``queries()`` / ``oracle_sql()`` aggregate across all plan modules.
"""

from olympic_athletes_etl_spark.plans.registry import oracle_sql, queries, query

# Import for registration side effects — each module registers its queries.
from olympic_athletes_etl_spark.plans import tpch  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import relational  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import textops  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import textstats  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import dedup_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import similarity_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import events_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import validate_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import udf_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import multimodal_q  # noqa: E402,F401
from olympic_athletes_etl_spark.plans import tpch_extra  # noqa: E402,F401

__all__ = ["queries", "oracle_sql", "query"]
