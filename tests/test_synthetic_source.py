"""sources.synthetic — custom Python Data Source contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.sources.synthetic import (
    SyntheticEventsDataSource,
    _row,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticEventsDataSource)
    return spark


def test_read_deterministic(registered):
    df = (
        registered.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 8)
        .load()
    )
    assert df.count() == 500
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    # partition planning honored
    assert df.rdd.getNumPartitions() == 8
    # values match the pure-python generator exactly
    got = df.filter(F.col("event_id").isin(0, 123, 499)).collect()
    for r in got:
        expect = _row(r["event_id"])
        assert (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"]) == expect


def test_source_composes_with_engine_ops(registered):
    df = (
        registered.read.format("synthetic_events")
        .option("n_rows", 1000)
        .load()
    )
    by_type = {
        r["event_type"]: r["n"]
        for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert sum(by_type.values()) == 1000
    assert set(by_type) == {"click", "error", "purchase", "signup", "view"}
