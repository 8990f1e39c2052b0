"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry from
``olympic_athletes_etl_spark.plans`` — one named query per implemented
operator from SURVEY.md §2 (plus the beyond-reference dedup/similarity/
multimodal/text-analysis/event/validation extensions), each paired with
a DuckDB oracle: since round 6 every registered query is hash-gated
(the procedural NOC UDF was the last rows-only exception, promoted via
the shared containment-filter oracle). Iterative operators whose
literals are data-dependent (bpe_learn_merges) are exposed through a
gated statistic query plus exact reference-implementation test pins
rather than a rows-only registration — and their FIXED-parameter
serving forms are fully gated (round 9: the frozen-merge-list encode
through both the fold and the Arrow encoders, the IVFPQ drift
diagnostic through the stored-index lifecycle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from olympic_athletes_etl_spark.plans import oracle_sql as _oracle_sql
from olympic_athletes_etl_spark.plans import queries as _queries
from olympic_athletes_etl_spark.plans.tpch import flagship_region_top_customers

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_region_top_customers(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
