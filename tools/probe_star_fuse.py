"""A/B: star-CC round with per-PHASE checkpoints (current) vs one fused
per-ROUND checkpoint (candidate).

The batch-3 window rewrite made each phase a LINEAR plan (no self-join),
so the intermediate large-star checkpoint may be a leftover: without it,
small-star's _sym union reads the large-star subtree twice, but that
subtree ends in the dropDuplicates exchange, which ReuseExchange dedups
— the question is whether the duplicated post-exchange aggregate costs
more than the saved checkpoint round-trip. Interleaved loop pairs on
the same checkpointed input; final edge sets must be identical.

Usage: python tools/probe_star_fuse.py [sf_dir] [pairs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.session import get_spark  # noqa: E402
from olympic_athletes_etl_spark.plans.dedup_q import d_minhash_lsh  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark(app_name="probe_star_fuse")
spark.sparkContext.setLogLevel("ERROR")

pairs = d_minhash_lsh(spark, sf_dir)
e0 = (
    pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    .filter(F.col("a") != F.col("b"))
    .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
    .dropDuplicates()
    .localCheckpoint(eager=True)
)
print("edges:", e0.count(), flush=True)

_w_u = Window.partitionBy("u")


def _sym(df):
    return df.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        df.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _large_star(df):
    withm = _sym(df).withColumn("m", F.least(F.min("v").over(_w_u), F.col("u")))
    return (
        withm.filter(F.col("v") > F.col("u"))
        .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def _small_star(df):
    withm = _sym(df).filter(F.col("v") < F.col("u")).withColumn(
        "m", F.min("v").over(_w_u)
    )
    return (
        withm.select(
            F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b")
        )
        .unionByName(withm.select(F.col("m").alias("a"), F.col("u").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def loop(e, fused: bool, max_iter: int = 60):
    n_edges = e.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        if fused:
            after_small = _small_star(_large_star(e)).localCheckpoint(
                eager=True
            )
        else:
            after_large = _large_star(e).localCheckpoint(eager=True)
            after_small = _small_star(after_large).localCheckpoint(eager=True)
            after_large.unpersist()
        n_next = after_small.count()
        unchanged = (
            n_next == n_edges
            and after_small.exceptAll(e).limit(1).count() == 0
        )
        if e is not e0:
            e.unpersist()
        e = after_small
        n_edges = n_next
        if unchanged:
            return e, rounds
    raise RuntimeError("no convergence")


for i in range(n_pairs):
    t0 = time.perf_counter()
    ea, ra = loop(e0, fused=False)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    eb, rb = loop(e0, fused=True)
    tb = time.perf_counter() - t0
    d = ea.exceptAll(eb).count() + eb.exceptAll(ea).count()
    print(
        f"pair {i}: phase-ckpt {ta:.3f}s ({ra} rounds)  "
        f"fused {tb:.3f}s ({rb} rounds)  edge-diff {d}",
        flush=True,
    )
    ea.unpersist()
    eb.unpersist()
