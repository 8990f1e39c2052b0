"""TPC-H-adapted relational coverage beyond q1/q3/q5 (the testdata is
TPC-H-ish: no partsupp/commitdate/shipmode/phone, so q2/q9/q11/q12/q16/
q17/q20/q21 have no faithful form here; the nine below keep each
original's plan shape on the columns that exist).

Plan-shape notes (the point of each query at 100 TB):

- q4    — EXISTS → left-semi join, aggregated after the semi (never a
          count-distinct over a fat join).
- q6    — pure scan-filter-agg; every predicate reaches the parquet scan.
- q7    — two nation dims broadcast twice under different aliases.
- q10   — fact→dim chain with group on customer attrs; top-k via
          TakeOrderedAndProject.
- q13   — LEFT join + two-level aggregation (distribution of counts).
- q14   — conditional aggregation (promo share) in one pass.
- q18   — HAVING on a grouped fact feeding a semi-join back to the fact.
- q19   — OR-of-ANDs predicate pushed into one broadcast hash join.
- q22   — anti-join (customers with no orders) + scalar-subquery filter
          as a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.registry import query
from olympic_athletes_etl_spark.plans.tables import load

# Revenue summed EXACTLY: prices/discounts carry 2 decimals, so
# cents·(100 - pct) is an integer; bigint sums are order-independent,
# where double sums differ in the last bit between engines and can flip
# a round() boundary (observed on q7 at sf0.01).
_REV_INT = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


# No round(): Spark's round() rounds the shortest decimal repr of a
# double (BigDecimal HALF_UP) while DuckDB rounds the exact binary value
# — they disagree on .xx5 boundaries. Integer-truncate to cents with
# bigint DIV instead: both engines then divide the SAME bigint by 100
# and produce bit-identical doubles.
def _rev_sum(alias: str = "revenue") -> F.Column:
    return (
        F.expr(f"CAST(sum({_REV_INT}) DIV 100 AS DOUBLE) / 100.0").alias(alias)
    )


def _rev_sum_sql(alias: str = "revenue") -> str:
    return f"CAST(sum({_REV_INT}) // 100 AS DOUBLE) / 100.0 AS {alias}"


@query(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: orders with at least one lineitem shipped >60 days after
    order date, counted by priority. EXISTS compiles to a left-semi join
    keyed on orderkey — the aggregate runs on orders only."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {_rev_sum_sql()}
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6: scan-filter-aggregate; all three predicates push to parquet."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_rev_sum())
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_rev_sum_sql()}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: shipping volume between nation pairs by year — the
    nation dim broadcasts twice under different aliases; the fact side
    never shuffles until the final group.

    ``spread_on`` the orders join key (guide §2.5): the bench layout's
    single-row-group fact scan would run the five join probes in one
    populated task; redistribution parallelizes them and is a no-op on
    a layout that splits. Exact integer revenue sums are
    partition-order-proof."""
    lineitem = load(spark, sf_dir, "lineitem", spread_on="l_orderkey")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_rev_sum())
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_rev_sum_sql()}
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10: revenue lost to returns per customer, top 20 — ordered limit
    is TakeOrderedAndProject, not a global sort."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_rev_sum())
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13: distribution of orders-per-customer — LEFT join keeps
    zero-order customers (count(o_orderkey) skips their NULLs), then a
    second, tiny aggregation over the counts."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_INT} ELSE 0 END)
                 / sum({_REV_INT}) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14: promo revenue share — conditional aggregation in ONE pass
    (never two scans + a join of aggregates)."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", F.expr(_REV_INT)).otherwise(F.lit(0).cast("bigint"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (100.0 * F.sum(promo) / F.sum(F.expr(_REV_INT))).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180
    )
    GROUP BY 1, 2, 3, 4
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18: large-volume orders — the HAVING subquery aggregates the fact
    once and semi-joins back (threshold tuned to the synthetic data's
    quantity scale).

    ``spread_on`` l_orderkey (guide §2.5): both consumers key on it, so
    the one redistribution parallelizes the HAVING aggregate (its
    groupBy reuses the exchange's partitioning — §2.4) AND the main
    join probes off the single-row-group scan task; no-op on a layout
    that splits. sum(l_quantity) over integer-valued doubles is exact,
    partition-order-proof."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem", spread_on="l_orderkey")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(big.withColumnRenamed("l_orderkey", "big_key"),
              F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT {_rev_sum_sql()}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 40)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19: OR-of-ANDs bracket predicate evaluated inside one broadcast
    hash join (Catalyst keeps the equi-key join and applies the residual
    disjunction as a post-join filter)."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(_rev_sum())
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_bal
    FROM customer
    WHERE CAST(round(c_acctbal * 100) AS BIGINT)
            * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape (phone-cc column doesn't exist → segment stands in):
    above-average-balance customers with no RECENT orders (idle since
    2000 — in this synthetic data every customer has some order, so the
    unrestricted form is vacuously empty). The scalar average is a 1-row
    broadcast; the NOT EXISTS is a left-anti join whose right side is
    filtered BEFORE the join — the filter prunes the anti-join build.

    The above-average filter compares EXACT integers: bal > Σbal/n is
    evaluated as bal_cents·n > Σbal_cents (n > 0, so the inequality is
    preserved for balances of either sign) — a raw-double avg differs
    cross-engine in the last ulp and can flip a knife-edge customer
    (the r12 sf10 money-sum class, applied to a threshold)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    bal_stats = customer.filter(F.col("c_acctbal") > 0).agg(
        F.expr("sum(CAST(round(c_acctbal * 100) AS BIGINT))").alias("bal_sum"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        customer.crossJoin(F.broadcast(bal_stats))
        .filter(
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > bal_sum")
        )
        .join(
            orders.filter(F.col("o_orderdate") >= "2000-01-01"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr(
                "CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))"
                " AS DOUBLE) / 100.0"
            ).alias("total_bal"),
        )
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_rev AS (
      SELECT year(o_orderdate) AS o_year,
             {_REV_INT} AS rev_int,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_int ELSE 0 END)
                AS DOUBLE) / sum(rev_int) AS mkt_share
    FROM all_rev GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape: one nation's share of a region's revenue by order year —
    conditional aggregation over a 5-dim broadcast chain; the share is a
    ratio of two exact bigint sums (one double division at the end, no
    round — cross-engine bit-identical)."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_int = F.expr(_REV_INT)
    base = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("cn_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("r_regionkey") == F.col("cn_region"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("sn_key") == F.col("s_nationkey"))
    )
    target = F.when(F.col("supp_nation") == "NATION_1", rev_int).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(rev_int)).alias("mkt_share")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_REV_INT}) // 100 AS DOUBLE) / 100.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN srev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15: the supplier(s) with maximum quarterly revenue — the scalar
    max is a 1-row broadcast against the per-supplier aggregate (never a
    global sort); revenue compared on the exact truncated-cents value so
    the equality join is safe in floating point."""
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    srev = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev_sum("total_revenue"))
    )
    max_rev = srev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        supplier
        .join(srev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q_sum,
             count(*) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // 700
                AS DOUBLE) / 100.0 AS avg_weekly_revenue
    FROM lineitem JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE 2 * CAST(round(l_quantity * 100) AS BIGINT) * n < q_sum
      AND l_extendedprice IS NOT NULL
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: revenue from below-half-average-quantity orders per
    part — the correlated per-part average becomes a self-aggregate +
    equi-join (the aggregate side is (partkey, sum, count): far smaller
    than the fact, and the planner/AQE broadcasts it while it fits — no
    hard hint, since it scales with the part count). The
    below-half-average predicate is
    EXACT integer arithmetic (2·q·n < Σq — a double average differs
    between engines in the last bit and can flip boundary rows); revenue
    sums exact cents, ONE double division at the end."""
    lineitem = load(spark, sf_dir, "lineitem")
    q_cents = F.expr("CAST(round(l_quantity * 100) AS BIGINT)")
    pa = lineitem.groupBy("l_partkey").agg(
        F.sum(q_cents).alias("q_sum"), F.count(F.lit(1)).alias("n")
    )
    return (
        lineitem.join(pa, on="l_partkey")
        .filter(
            (2 * q_cents * F.col("n") < F.col("q_sum"))
            & F.col("l_extendedprice").isNotNull()
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) DIV 700"
                " AS DOUBLE) / 100.0"
            ).alias("avg_weekly_revenue")
        )
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape (shipmode column doesn't exist → returnflag buckets the
    lines): among late-shipped lines (>30 days after order), count
    high- vs low-priority orders per bucket — two conditional counts in
    ONE aggregation pass over one join."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )
