"""Phase/round breakdown of d_dup_clusters_star at sf0.1 (probe)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.session import get_spark  # noqa: E402
from olympic_athletes_etl_spark.plans.dedup_q import d_minhash_lsh  # noqa: E402
from olympic_athletes_etl_spark.plans.tables import load  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe_star")

t0 = time.monotonic()
docs = load(spark, sf_dir, "documents")
n_docs = docs.count()
print(f"docs: {n_docs} ({time.monotonic()-t0:.2f}s)")

t0 = time.monotonic()
pairs = d_minhash_lsh(spark, sf_dir)
raw = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).localCheckpoint(eager=True)
print(f"pairs checkpoint: {raw.count()} rows ({time.monotonic()-t0:.2f}s)")

# replicate connected_components_star's loop with per-round timing
t0 = time.monotonic()
e = (
    raw.filter(F.col("a") != F.col("b"))
    .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
    .dropDuplicates()
    .localCheckpoint(eager=True)
)
print(f"normalize: {e.count()} edges ({time.monotonic()-t0:.2f}s)")


def _sym(df):
    return df.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        df.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _large_star(df):
    sym = _sym(df)
    m = sym.groupBy("u").agg(F.min("v").alias("mv")).select("u", F.least("mv", "u").alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def _small_star(df):
    sym = _sym(df).filter(F.col("v") < F.col("u"))
    m = sym.groupBy("u").agg(F.min("v").alias("m"))
    return (
        sym.join(m, "u")
        .select(F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b"))
        .unionByName(m.select(F.col("m").alias("a"), F.col("u").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


n_edges = e.count()
for rnd in range(60):
    t0 = time.monotonic()
    al = _large_star(e).localCheckpoint(eager=True)
    t1 = time.monotonic()
    asm = _small_star(al).localCheckpoint(eager=True)
    t2 = time.monotonic()
    n_next = asm.count()
    unchanged = n_next == n_edges and asm.exceptAll(e).limit(1).count() == 0
    t3 = time.monotonic()
    print(
        f"round {rnd}: large {t1-t0:.2f}s small {t2-t1:.2f}s probe {t3-t2:.2f}s"
        f"  edges {n_edges}->{n_next} unchanged={unchanged}"
    )
    e = asm
    n_edges = n_next
    if unchanged:
        break
