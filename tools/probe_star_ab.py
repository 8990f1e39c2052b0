"""A/B: star-CC phase via groupBy+join (current) vs window-min (candidate).

Same session, same checkpointed edge input, run the full loop both ways
and compare per-round + total times AND the final label sets (must be
identical).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.session import get_spark  # noqa: E402
from olympic_athletes_etl_spark.plans.dedup_q import d_minhash_lsh  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_star_ab")

pairs = d_minhash_lsh(spark, sf_dir)
raw = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).localCheckpoint(eager=True)
e0 = (
    raw.filter(F.col("a") != F.col("b"))
    .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
    .dropDuplicates()
    .localCheckpoint(eager=True)
)
print("edges:", e0.count())


def _sym(df):
    return df.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        df.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


# -- current form ----------------------------------------------------------
def large_join(df):
    sym = _sym(df)
    m = sym.groupBy("u").agg(F.min("v").alias("mv")).select("u", F.least("mv", "u").alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def small_join(df):
    sym = _sym(df).filter(F.col("v") < F.col("u"))
    m = sym.groupBy("u").agg(F.min("v").alias("m"))
    return (
        sym.join(m, "u")
        .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
        .unionByName(m.select(F.col("m").alias("a"), F.col("u").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


# -- window form -----------------------------------------------------------
W = Window.partitionBy("u")


def large_win(df):
    sym = _sym(df)
    withm = sym.withColumn("m", F.least(F.min("v").over(W), F.col("u")))
    return (
        withm.filter(F.col("v") > F.col("u"))
        .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def small_win(df):
    sym = _sym(df).filter(F.col("v") < F.col("u"))
    withm = sym.withColumn("m", F.min("v").over(W))  # m < u always
    out = withm.select(
        F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b")
    ).unionByName(
        withm.select(F.col("m").alias("a"), F.col("u").alias("b"))
    )
    return out.filter(F.col("a") != F.col("b")).dropDuplicates()


def run(tag, large, small):
    e = e0
    n_edges = e.count()
    t_all = time.monotonic()
    rounds = 0
    for _ in range(60):
        rounds += 1
        al = large(e).localCheckpoint(eager=True)
        asm = small(al).localCheckpoint(eager=True)
        n_next = asm.count()
        unchanged = n_next == n_edges and asm.exceptAll(e).limit(1).count() == 0
        e = asm
        n_edges = n_next
        if unchanged:
            break
    print(f"{tag}: {time.monotonic() - t_all:.2f}s  rounds={rounds}  final_edges={n_edges}")
    return e


# warmup both, then measure interleaved twice
for it in range(3):
    ej = run(f"join-form  it{it}", large_join, small_join)
    ew = run(f"window-form it{it}", large_win, small_win)

diff = ej.exceptAll(ew).count() + ew.exceptAll(ej).count()
print("final edge-set diff rows:", diff)
