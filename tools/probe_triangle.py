"""Interleaved A/B: triangle closing via wedge-set join (current) vs
capped out-neighbor arrays + array_intersect (candidate, guide §3 —
removes the wedge-set shuffle). Counts must be identical.

Run: SPARK_GRAFT_SF_DIR=... python tools/probe_triangle.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olympic_athletes_etl_spark.plans.graph_q import _edges  # noqa: E402
from olympic_athletes_etl_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark(app_name="probe_triangle")
sc = spark.sparkContext

_TRI_STRIDE = None
from olympic_athletes_etl_spark.operators import graph as G  # noqa: E402

_TRI_STRIDE = G._TRI_STRIDE

e0 = (
    _edges(spark, sf_dir)
    .select(F.col("pa"), F.col("pb"))
    .localCheckpoint(eager=True)
)
print("edges:", e0.count())


def _oriented(e):
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionByName(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    okey = F.col("deg") * _TRI_STRIDE + F.col("node")
    ka = deg.select(F.col("node").alias("pa"), okey.alias("ka"))
    kb = deg.select(F.col("node").alias("pb"), okey.alias("kb"))
    ek = e.join(ka, "pa").join(kb, "pb")
    return ek.select(
        F.when(F.col("ka") < F.col("kb"), F.col("pa"))
        .otherwise(F.col("pb"))
        .alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("pb"))
        .otherwise(F.col("pa"))
        .alias("dst"),
        F.greatest("ka", "kb").alias("kdst"),
    ).localCheckpoint(eager=True)


def tri_wedge(e):
    oriented = _oriented(e)
    o1 = oriented.select("src", F.col("dst").alias("v"), F.col("kdst").alias("k1"))
    o2 = oriented.select("src", F.col("dst").alias("w"), F.col("kdst").alias("k2"))
    wedges = o1.join(o2, "src").filter(F.col("k1") < F.col("k2")).select("v", "w")
    return wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).agg(F.count(F.lit(1)).alias("n_triangles"))


def tri_intersect(e):
    oriented = _oriented(e)
    # per-src out-neighbor array (out-degree capped at O(sqrt m) by the
    # orientation, so arrays are bounded)
    nbrs = oriented.groupBy("src").agg(
        F.collect_list("dst").alias("nb")
    )
    ja = nbrs.select(F.col("src"), F.col("nb").alias("nb_u"))
    jb = nbrs.select(F.col("src").alias("dst"), F.col("nb").alias("nb_v"))
    per_edge = (
        oriented.join(ja, "src")
        .join(jb, "dst")
        .select(
            F.size(F.array_intersect(F.col("nb_u"), F.col("nb_v"))).alias(
                "c"
            )
        )
    )
    return per_edge.agg(F.sum("c").cast("long").alias("n_triangles"))


def run(tag, fn):
    grp = f"{tag}-{time.monotonic_ns()}"
    sc.setJobGroup(grp, tag)
    t0 = time.monotonic()
    out = fn(e0)
    rows = out.collect()
    dt = time.monotonic() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(grp) or [])
    sc.setJobGroup(None, None)
    return dt, jobs, rows[0]["n_triangles"]


_, _, a = run("warm-wedge", tri_wedge)
_, _, b = run("warm-int", tri_intersect)
print(f"triangles wedge={a} intersect={b} match={a == b}")

for i in range(n_pairs):
    if i % 2 == 0:
        tw, jw, _ = run("wedge", tri_wedge)
        ti, ji, _ = run("intersect", tri_intersect)
    else:
        ti, ji, _ = run("intersect", tri_intersect)
        tw, jw, _ = run("wedge", tri_wedge)
    print(f"pair{i}: wedge {tw:.3f}s/{jw}jobs  intersect {ti:.3f}s/{ji}jobs")
