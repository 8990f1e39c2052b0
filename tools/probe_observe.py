"""Functional probe: does ``df.observe(obs, ...).localCheckpoint(eager=True)``
deliver the observed metrics (so a CC round's convergence check can ride the
checkpoint materialization instead of a separate probe job)?

Also counts Spark JOBS per CC round shape, before vs after, via the
status tracker — the evidence VERDICT r13 item 2 asks for.

Run: python tools/probe_observe.py
"""
from __future__ import annotations

import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("probe_observe")
        .getOrCreate()
    )
    sc = spark.sparkContext

    df = spark.range(0, 1000).withColumn(
        "prev", F.col("id") + (F.col("id") % 7)
    )

    # --- 1. metrics through an eager localCheckpoint -------------------
    obs = Observation()
    t0 = time.perf_counter()
    ck = (
        df.observe(
            obs,
            F.count(F.when(F.col("id") != F.col("prev"), True)).alias(
                "changed"
            ),
        )
        .select("id")  # prev dropped ABOVE the observe: is it still counted?
        .localCheckpoint(eager=True)
    )
    t1 = time.perf_counter()
    got = obs.get
    t2 = time.perf_counter()
    print(
        f"observe-through-checkpoint: {got!r} "
        f"(ckpt {t1 - t0:.3f}s, obs.get {t2 - t1:.3f}s)"
    )
    expected = 1000 - len([i for i in range(1000) if i % 7 == 0])
    assert got["changed"] == expected, (got, expected)
    # checkpointed frame is usable and narrow
    assert ck.columns == ["id"]
    assert ck.count() == 1000

    # --- 2. job count: old probe shape vs observe shape ----------------
    def jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    edges = spark.range(0, 5000).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    labels = edges.select(F.col("a").alias("vertex")).withColumn(
        "component", F.col("vertex")
    )

    sc.setJobGroup("old", "old probe shape")
    j0 = sc.statusTracker().getJobIdsForGroup("old")
    new_full = labels.withColumn(
        "prev", F.col("component")
    ).localCheckpoint(eager=True)
    changed = (
        new_full.filter(F.col("component") != F.col("prev")).limit(1).count()
    )
    j1 = sc.statusTracker().getJobIdsForGroup("old")
    print(f"old shape: {len(j1) - len(j0)} jobs (changed={changed})")

    sc.setJobGroup("new", "observe shape")
    j0 = sc.statusTracker().getJobIdsForGroup("new")
    obs2 = Observation()
    ck2 = (
        labels.withColumn("prev", F.col("component"))
        .observe(
            obs2,
            F.count(F.when(F.col("component") != F.col("prev"), True)).alias(
                "changed"
            ),
        )
        .select("vertex", "component")
        .localCheckpoint(eager=True)
    )
    changed2 = obs2.get["changed"]
    j1 = sc.statusTracker().getJobIdsForGroup("new")
    print(f"new shape: {len(j1) - len(j0)} jobs (changed={changed2})")
    assert ck2.columns == ["vertex", "component"]

    spark.stop()
    print("PROBE OK")


if __name__ == "__main__":
    main()
