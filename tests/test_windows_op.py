"""operators.windows — two-pass partitioned cumsum == global window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.operators.windows import partitioned_running_sum


def _reference_cumsum(df, order_cols, value_col, group_cols=()):
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("expect", F.sum(value_col).over(w))


def test_matches_global_window_across_buckets(spark):
    # 1000 rows, bucket = k DIV 100 → 10 buckets; values signed so the
    # carried-in offsets are nontrivial (partial sums cross zero)
    df = spark.range(1000).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 19 - 9).alias("v")
    )
    got = partitioned_running_sum(
        df, bucket=F.expr("k DIV 100"), order_cols=["k"], value_col="v",
        out_col="cum", broadcast_offsets=True,
    )
    joined = got.join(
        _reference_cumsum(df, ["k"], "v").select("k", "expect"), on="k"
    )
    assert joined.filter(F.col("cum") != F.col("expect")).count() == 0
    assert got.count() == 1000
    assert set(got.columns) == {"k", "v", "cum"}  # helper cols dropped


def test_matches_partitioned_window_with_groups(spark):
    df = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") * 13) % 7).alias("v"),
    )
    got = partitioned_running_sum(
        df, bucket=F.expr("k DIV 50"), order_cols=["k"], value_col="v",
        out_col="cum", group_cols=["g"],
    )
    ref = _reference_cumsum(df, ["k"], "v", group_cols=["g"]).select(
        "g", "k", "expect"
    )
    joined = got.join(ref, on=["g", "k"])
    assert joined.count() == 600
    assert joined.filter(F.col("cum") != F.col("expect")).count() == 0


def test_single_bucket_degenerates_to_plain_cumsum(spark):
    df = spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    got = {
        r["k"]: r["cum"]
        for r in partitioned_running_sum(
            df, bucket=F.lit(0), order_cols=["k"], value_col="v", out_col="cum"
        ).collect()
    }
    assert got == {k: k + 1 for k in range(50)}


def test_null_bucket_rows_are_kept_and_sum_first(spark):
    # a NULL bucket (e.g. date_trunc of a null timestamp) must behave
    # exactly like the single-window form: nulls-first in the order,
    # rows RETAINED (a plain equi-join on the bucket key would drop
    # them — null keys never match).
    rows = [(None, 5), (0, 1), (1, 2), (2, 3), (10, 4)]
    df = spark.createDataFrame(rows, "k: long, v: long")
    got = partitioned_running_sum(
        df,
        bucket=F.expr("k DIV 10"),
        order_cols=[F.col("k").asc_nulls_first()],
        value_col="v",
        out_col="cum",
    )
    assert got.count() == 5  # the null-bucket row survives
    by_k = {r["k"]: r["cum"] for r in got.collect()}
    # nulls-first: the null row opens the sequence
    assert by_k[None] == 5
    assert by_k[0] == 6 and by_k[1] == 8 and by_k[2] == 11
    assert by_k[10] == 15


def test_matches_global_window_descending_with_negated_bucket(spark):
    # the q_abc_analysis usage: DESC value order with bucket = -(v DIV k)
    # — negation keeps the bucket monotone NON-DECREASING along the
    # descending order, which is the operator's contract
    df = spark.range(500).select(
        F.col("id").alias("k"), ((F.col("id") * 41) % 1000).alias("v")
    )
    got = partitioned_running_sum(
        df,
        bucket=F.expr("-(v DIV 100)"),
        order_cols=[F.desc("v"), F.asc("k")],
        value_col="v",
        out_col="cum",
    )
    ref = _reference_cumsum(df, [F.desc("v"), F.asc("k")], "v").select(
        "k", "expect"
    )
    joined = got.join(ref, on="k")
    assert joined.count() == 500
    assert joined.filter(F.col("cum") != F.col("expect")).count() == 0
