"""Semantic invariants for the TPC-H completion queries (tpch_close.py).

The DuckDB oracle pins cross-engine value equality; these pin the
business meaning of each adaptation against independently recomputed
facts (an oracle that mirrored a bug would still hash-match).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.tables import load
from olympic_athletes_etl_spark.plans.tpch_close import (
    q2_min_cost_supplier,
    q9_product_profit,
    q11_important_stock,
    q16_part_supplier_count,
    q20_excess_stock,
    q21_waiting_suppliers,
)


def test_q2_reports_the_minimum_cost_supplier(spark, sf_dir):
    rows = q2_min_cost_supplier(spark, sf_dir).collect()
    assert rows
    # per part, every reported cost equals the part's minimum reported cost
    # (several suppliers may tie at the minimum — all must carry it)
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], []).append(r["cost_cents"])
    for costs in by_part.values():
        assert len(set(costs)) == 1
    # and the part filter held
    part = load(spark, sf_dir, "part")
    ok = {
        r["p_partkey"]
        for r in part.filter(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
        ).collect()
    }
    assert set(by_part) <= ok


def test_q9_profit_matches_identity_for_one_group(spark, sf_dir):
    rows = q9_product_profit(spark, sf_dir).collect()
    assert rows
    # recompute one (nation, year) group's profit from scratch and check
    # the revenue-minus-cost identity in exact 1e-4 units
    target = rows[0]
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    amt = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
        " - CAST(round(p_retailprice * 100) AS BIGINT)"
        " * CAST(round(l_quantity * 100) AS BIGINT)"
    )
    manual = (
        lineitem.join(
            part.filter(F.col("p_name").like("%widget%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            nation.filter(F.col("n_name") == target["nation"]),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            orders.filter(F.year("o_orderdate") == target["o_year"]),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(F.sum(amt))
        .collect()[0][0]
    )
    assert abs(target["profit"] - manual / 10000.0) < 1e-6


def test_q11_share_threshold_holds_exactly(spark, sf_dir):
    rows = q11_important_stock(spark, sf_dir).collect()
    total = sum(r["value_cents"] for r in rows)
    # every reported part clears the 1/1000 share bar vs the FULL total,
    # recomputed independently
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    full_total = (
        lineitem.join(
            supplier.join(
                nation.filter(F.col("n_name") == "NATION_3"),
                F.col("n_nationkey") == F.col("s_nationkey"),
            ).select("s_suppkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .agg(F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")))
        .collect()[0][0]
    )
    assert total <= full_total
    for r in rows:
        assert r["value_cents"] * 1000 > full_total
    # an empty result must be CORRECT emptiness (q11's threshold is fixed,
    # not SF-scaled — see its docstring — so at sf0.1 no part clears the
    # bar; this branch keeps the test non-vacuous there): verify that the
    # single largest part value indeed misses the cut
    if not rows:
        max_part = (
            lineitem.join(
                supplier.join(
                    nation.filter(F.col("n_name") == "NATION_3"),
                    F.col("n_nationkey") == F.col("s_nationkey"),
                ).select("s_suppkey"),
                F.col("s_suppkey") == F.col("l_suppkey"),
            )
            .groupBy("l_partkey")
            .agg(
                F.sum(
                    F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                ).alias("v")
            )
            .agg(F.max("v"))
            .collect()[0][0]
        )
        assert max_part * 1000 <= full_total


def test_q16_excludes_negative_balance_suppliers(spark, sf_dir):
    total = sum(
        r["supplier_cnt"] for r in q16_part_supplier_count(spark, sf_dir).collect()
    )
    assert total > 0
    # recompute one group's count by hand with the exclusion applied
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    bad = {r["s_suppkey"] for r in supplier.filter(F.col("s_acctbal") < 0).collect()}
    one = q16_part_supplier_count(spark, sf_dir).collect()[0]
    manual = (
        lineitem.join(
            part.filter(
                (F.col("p_brand") == one["p_brand"])
                & (F.col("p_size") == one["p_size"])
                & (F.col("p_brand") != "Brand#1")
                & (~F.col("p_type").isin("PROMO", "ECONOMY"))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("l_suppkey")
        .distinct()
        .collect()
    )
    assert one["supplier_cnt"] == len({r[0] for r in manual} - bad)


def test_q20_suppliers_shipped_majority_in_1996(spark, sf_dir):
    rows = q20_excess_stock(spark, sf_dir).collect()
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    red = lineitem.join(
        part.filter(F.col("p_name").like("red%")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    qty = F.expr("CAST(round(l_quantity * 100) AS BIGINT)")
    in96 = (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ps = red.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("tq"),
        F.sum(F.when(in96, qty).otherwise(F.lit(0))).alias("q96"),
    )
    qualifying = {
        r["l_suppkey"]
        for r in ps.filter((F.col("q96") > 0) & (2 * F.col("q96") > F.col("tq")))
        .select("l_suppkey")
        .collect()
    }
    for r in rows:
        assert r["s_suppkey"] in qualifying


def test_q21_reported_suppliers_were_sole_late_in_multisupplier_orders(spark, sf_dir):
    rows = q21_waiting_suppliers(spark, sf_dir).collect()
    if not rows:  # tiny SF can legitimately produce none
        return
    # recompute the per-order flags and check one reported supplier's count
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    lo = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).withColumn("late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
    flags = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nl"),
    )
    name_of = {
        r["s_suppkey"]: r["s_name"]
        for r in supplier.join(
            nation.filter(F.col("n_name") == "NATION_7"),
            F.col("n_nationkey") == F.col("s_nationkey"),
        ).collect()
    }
    manual = (
        lo.filter(F.col("late"))
        .join(
            flags.filter((F.col("ns") > 1) & (F.col("nl") == 1)).select("l_orderkey"),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    manual_by_name = {
        name_of[r["l_suppkey"]]: r["n"] for r in manual if r["l_suppkey"] in name_of
    }
    for r in rows:
        assert manual_by_name.get(r["s_name"]) == r["numwait"]


def test_skyline_members_are_mutually_non_dominated(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.tpch_close import q_skyline_parts

    rows = [
        (r["p_partkey"], r["price_c"], r["p_size"])
        for r in q_skyline_parts(spark, sf_dir).collect()
    ]
    assert rows  # the frontier is never empty on non-empty input
    # no member may dominate another member (pairwise, frontier is tiny)
    for _, p_price, p_size in rows:
        for _, q_price, q_size in rows:
            dominated = (
                q_price <= p_price
                and q_size >= p_size
                and (q_price < p_price or q_size > p_size)
            )
            assert not dominated


def test_skyline_contains_the_corner_points(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.tables import load
    from olympic_athletes_etl_spark.plans.tpch_close import q_skyline_parts

    from pyspark.sql import functions as F

    part = load(spark, sf_dir, "part").select(
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("price_c"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    pts = [(r["price_c"], r["p_size"]) for r in part.collect()]
    # corner points of the frontier: biggest size among cheapest parts,
    # and cheapest price among biggest parts — both must be skyline rows
    min_price = min(p for p, _ in pts)
    corner_a = (min_price, max(s for p, s in pts if p == min_price))
    max_size = max(s for _, s in pts)
    corner_b = (min(p for p, s in pts if s == max_size), max_size)
    sky = {
        (r["price_c"], r["p_size"])
        for r in q_skyline_parts(spark, sf_dir).collect()
    }
    assert corner_a in sky
    assert corner_b in sky


def test_association_rules_metrics_are_bounded_and_consistent(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.tpch_close import (
        _AR_MIN_SUPPORT,
        _AR_TOPN,
        q_association_rules,
    )

    rows = q_association_rules(spark, sf_dir).collect()
    assert 0 < len(rows) <= _AR_TOPN
    for r in rows:
        assert r["antecedent"] != r["consequent"]
        assert r["n_ab"] >= _AR_MIN_SUPPORT
        # confidence is a probability x1000; floor division keeps it <= 1000
        assert 0 < r["conf_x1000"] <= 1000
        assert r["lift_x1000"] > 0
    # the top-50 screen surfaces positively associated pairs: at the
    # head of the lift ordering, lift must exceed independence (1000)
    assert rows[0]["lift_x1000"] >= 1000


def test_cohort_ltv_monotone_and_conserves_total_revenue(spark, sf_dir):
    from pyspark.sql import functions as F

    from olympic_athletes_etl_spark.plans.tables import load
    from olympic_athletes_etl_spark.plans.tpch_close import q_cohort_ltv

    rows = q_cohort_ltv(spark, sf_dir).collect()
    assert rows
    curves: dict = {}
    for r in rows:
        curves.setdefault((r["cohort_year"], r["cohort_month"]), []).append(
            (r["age_months"], r["cum_revenue_cents"])
        )
    final_total = 0
    for seq in curves.values():
        seq.sort()
        vals = [v for _, v in seq]
        assert vals == sorted(vals)  # cumulative: monotone in age
        assert seq[0][0] == 0  # every cohort spends in its first month
        final_total += vals[-1]
    total = (
        load(spark, sf_dir, "orders")
        .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
        .first()[0]
    )
    assert final_total == total  # curves partition ALL revenue exactly
