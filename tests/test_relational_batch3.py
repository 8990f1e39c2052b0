"""Semantic invariants for the round-3 relational/events additions
(full-outer reconciliation, INTERSECT, salted join, late arrivals,
deciles, WAU, SCD2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.events_q import (
    e_late_arrivals,
    e_weekly_active_users,
    r_scd2_intervals,
)
from olympic_athletes_etl_spark.plans.relational import (
    a_intersect_keys,
    j_full_outer_recon,
    j_salted_enrich,
    w_ntile_deciles,
)
from olympic_athletes_etl_spark.plans.tables import load


def test_full_outer_recon_partitions_both_sides(spark, sf_dir):
    rows = j_full_outer_recon(spark, sf_dir).collect()
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    n_prof = customer.filter(F.col("c_acctbal") > 5000).count()
    n_act = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_custkey")
        .distinct()
        .count()
    )
    # full outer: every profile row and every activity key appears once
    assert sum(1 for r in rows if r["has_profile"]) == n_prof
    assert sum(1 for r in rows if r["has_activity"]) == n_act
    assert all(r["has_profile"] or r["has_activity"] for r in rows)
    # keys unique after coalesce
    keys = [r["custkey"] for r in rows]
    assert len(keys) == len(set(keys))


def test_intersect_keys_subset_of_both(spark, sf_dir):
    got = {r["nationkey"] for r in a_intersect_keys(spark, sf_dir).collect()}
    cust = {
        r[0]
        for r in load(spark, sf_dir, "customer").select("c_nationkey").distinct().collect()
    }
    supp = {
        r[0]
        for r in load(spark, sf_dir, "supplier").select("s_nationkey").distinct().collect()
    }
    assert got == cust & supp


def test_salted_enrich_equals_unsalted_semantics(spark, sf_dir):
    got = {
        r["tier"]: (r["n_events"], r["n_users"])
        for r in j_salted_enrich(spark, sf_dir).collect()
    }
    events = load(spark, sf_dir, "events")
    stats = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .withColumn(
            "tier",
            F.when(F.col("n_ev") >= 100, "heavy")
            .when(F.col("n_ev") >= 50, "mid")
            .otherwise("light"),
        )
    )
    want = {
        r["tier"]: (r["n_events"], r["n_users"])
        for r in events.join(stats, "user_id")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .collect()
    }
    assert got == want


def test_late_arrivals_bounds(spark, sf_dir):
    rows = e_late_arrivals(spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["n_late"] < r["n_events"]  # first event is never late
        assert (r["max_late_us"] > 0) == (r["n_late"] > 0)


def test_ntile_deciles_are_balanced_per_segment(spark, sf_dir):
    rows = w_ntile_deciles(spark, sf_dir).collect()
    per_seg: dict[str, dict[int, int]] = {}
    for r in rows:
        per_seg.setdefault(r["c_mktsegment"], {}).setdefault(r["decile"], 0)
        per_seg[r["c_mktsegment"]][r["decile"]] += 1
    for seg, deciles in per_seg.items():
        assert set(deciles) == set(range(1, 11)), seg
        # ntile balance: sizes differ by at most 1
        assert max(deciles.values()) - min(deciles.values()) <= 1, seg


def test_wau_covers_every_active_day_and_bounds(spark, sf_dir):
    rows = {r["day"]: r["wau"] for r in e_weekly_active_users(spark, sf_dir).collect()}
    events = load(spark, sf_dir, "events")
    act = events.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    daily = {
        str(r["d"]): r["n"]
        for r in act.groupBy("d").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    n_users = events.select("user_id").distinct().count()
    assert set(rows) == set(daily)  # one row per active day
    for day, wau in rows.items():
        assert daily[day] <= wau <= n_users  # DAU ≤ WAU ≤ total users


def test_scd2_intervals_chain_per_user(spark, sf_dir):
    rows = r_scd2_intervals(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # exactly one open (current) interval per user, and it is the last
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        # intervals chain: each valid_to == next valid_from; type changes
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["event_type"] != b["event_type"], uid
