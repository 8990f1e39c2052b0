"""Testdata table access.

One place that knows the driver's table layout (TESTDATA.md): one parquet
file per table under ``{sf_dir}/{name}.parquet``. Reads go through
``spark.read.parquet`` so Catalyst gets parquet column pruning + predicate
pushdown for free; we deliberately do NOT cache here — each query declares
its own plan end-to-end so ``.explain()`` shows the real scan.

``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark rejects
by default. We read it via ``spark.sql.legacy.parquet.nanosAsLong`` and
floor-divide to microseconds — exactly DuckDB's ns→µs truncation, so the
oracle sees identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.session import tune_for_oracle

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune_for_oracle(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # nanos → long on read, then truncate to micros (matches DuckDB).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)
