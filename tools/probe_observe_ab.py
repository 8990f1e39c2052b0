"""Interleaved A/B: CC convergence probe as a separate job (r13 shape)
vs observed-checkpoint (r14) — wall time + Spark job counts, label sets
must match. Same session, same checkpointed edge input (the real
d_minhash_lsh pair graph at $SPARK_GRAFT_SF_DIR).

Run: python tools/probe_observe_ab.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.operators.graph import (  # noqa: E402
    _release_checkpoint,
    connected_components,
    connected_components_star,
)
from olympic_athletes_etl_spark.plans.dedup_q import d_minhash_lsh  # noqa: E402
from olympic_athletes_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark(app_name="probe_observe_ab")
sc = spark.sparkContext

pairs = d_minhash_lsh(spark, sf_dir)
edges = pairs.select(
    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
).localCheckpoint(eager=True)
print("pair edges:", edges.count())


def old_label_cc(e):
    """The r13 connected_components loop: prev carried through the
    checkpoint + a limit(1).count() probe job per round."""
    sym = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .dropDuplicates()
        .withColumn("component", F.col("vertex"))
    )
    prev_ckpt = labels
    for _ in range(1000):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["vertex"])
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_full = (
            labels.join(neighbor_min, on="vertex", how="left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_full.filter(F.col("component") != F.col("prev")).limit(1).count()
        )
        _release_checkpoint(prev_ckpt)
        prev_ckpt = new_full
        labels = new_full.select("vertex", "component")
        if changed == 0:
            break
    _release_checkpoint(sym)
    return labels


def run(tag, fn):
    grp = f"{tag}-{time.monotonic_ns()}"
    sc.setJobGroup(grp, tag)
    t0 = time.monotonic()
    out = fn()
    out.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(grp) or [])
    sc.setJobGroup(None, None)
    return dt, jobs, out


base_old = run("warm-old", lambda: old_label_cc(edges))[2]
base_new = run("warm-new", lambda: connected_components(edges))[2]
diff = base_old.exceptAll(base_new).count() + base_new.exceptAll(base_old).count()
print("label diff rows (must be 0):", diff)

for name, old_fn, new_fn in [
    (
        "label_cc",
        lambda: old_label_cc(edges),
        lambda: connected_components(edges),
    ),
]:
    for i in range(n_pairs):
        if i % 2 == 0:
            to, jo, _ = run("old", old_fn)
            tn, jn, _ = run("new", new_fn)
        else:
            tn, jn, _ = run("new", new_fn)
            to, jo, _ = run("old", old_fn)
        print(
            f"{name} pair{i}: old {to:.3f}s/{jo}jobs  "
            f"new {tn:.3f}s/{jn}jobs"
        )

# star CC: only the new form exists in the library; job-count evidence
t, j, out = run("star-new", lambda: connected_components_star(edges))
print(f"star_cc new form: {t:.3f}s / {j} jobs (vertices {out.count()})")
