"""Testdata table access.

One place that knows the driver's table layout (TESTDATA.md): one parquet
file per table under ``{sf_dir}/{name}.parquet``. Reads go through
``spark.read.parquet`` so Catalyst gets parquet column pruning + predicate
pushdown for free; we deliberately do NOT cache here — each query declares
its own plan end-to-end so ``.explain()`` shows the real scan.

``events.ts`` has shipped as two different physical parquet types across
driver rounds: TIMESTAMP(NANOS) (rounds 1-2), which Spark rejects by
default, and plain TIMESTAMP(MICROS) (round 3+), which reads natively as
TIMESTAMP_NTZ. We handle both: enable
``spark.sql.legacy.parquet.nanosAsLong`` before the read, and convert
ns→µs (exactly DuckDB's truncation) only when the column actually came
back as a long — a native timestamp column passes through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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
        # TIMESTAMP(NANOS) files surface as long under this conf; truncate
        # to micros (matches DuckDB). TIMESTAMP(MICROS) files ignore the
        # conf and arrive as a native timestamp — pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so the WHOLE engine
    surface is reachable from raw ``spark.sql`` — a user migrating
    SQL-first workloads points their FROM clauses at these names (the
    same names the DuckDB oracles use, so any oracle string in this repo
    is also a runnable Spark query modulo dialect). Views are lazy
    references to the normalized ``load`` output: events ts handling and
    session tuning apply identically to SQL and DataFrame users."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
