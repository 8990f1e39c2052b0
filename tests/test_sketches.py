"""operators.sketches — approximate aggregates within tolerance of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.operators.sketches import (
    approx_distinct,
    approx_percentiles,
)


def test_approx_distinct_within_rsd(spark):
    df = spark.range(20_000).select((F.col("id") % 5_000).alias("v"))
    got = approx_distinct(df, "v", rsd=0.02).collect()[0][0]
    assert abs(got - 5_000) / 5_000 < 0.05


def test_approx_distinct_grouped(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 1_000).alias("v")
    )
    rows = {r["g"]: r["approx_distinct_v"] for r in
            approx_distinct(df, "v", group=["g"]).collect()}
    for g in (0, 1):
        assert abs(rows[g] - 500) / 500 < 0.05


def test_approx_percentiles_close_to_exact(spark):
    df = spark.range(100_000).select(F.col("id").cast("double").alias("v"))
    [approx] = approx_percentiles(df, "v", (0.5, 0.99)).collect()[0]
    p50, p99 = approx
    assert abs(p50 - 50_000) < 1_000
    assert abs(p99 - 99_000) < 1_000


def test_kmv_cardinality_tracks_known_distincts(spark):
    from olympic_athletes_etl_spark.operators.sketches import kmv_cardinality

    df = spark.range(0, 20000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 3000).alias("v")
    )
    rows = {
        r["g"]: (r["n_exact"], r["est_distinct"])
        for r in kmv_cardinality(df, "v", group=["g"], exact=True).collect()
    }
    for g, (n, est) in rows.items():
        assert n == 1500
        assert 1500 / 3 <= est <= 1500 * 3  # well inside 4x test band


def test_cms_frequencies_upper_bounds_every_count(spark):
    from olympic_athletes_etl_spark.operators.sketches import cms_frequencies

    df = spark.range(0, 5000).select(
        F.concat(F.lit("tok"), (F.col("id") % 400).cast("string")).alias("w")
    )
    rows = cms_frequencies(df, "w", depth=4, width=128).collect()
    assert len(rows) == 400
    for r in rows:
        assert r["cms_est"] >= r["cnt"]
        # additive bound: total/width per row, min over 4 rows can only
        # tighten it; with adversarial-free uniform data stay within 2x
        assert r["cms_est"] <= r["cnt"] + 4 * (5000 // 128)
