"""Validation-rule engine exposed on the correctness surface (SURVEY.md
§5 Phase 3; reference: pandas_based/src/data_quality_and_validation.py —
Pandera schemas with lazy failure capture).

Both queries run the REAL ``RuleSet`` engine from
``olympic_athletes_etl_spark.validate`` against TPC-H-ish tables, with
reference-shaped rules (isin, range, cross-column comparison, key
uniqueness — data_quality_and_validation.py:24-235 analogues):

- v_rule_summary   — (rule, n_checked, n_failed): the ``validate(lazy=True)``
  aggregate view; ONE aggregation job over the fact table.
- v_failure_cases  — one row per (violating row × violated rule) with
  context columns: the ``get_error_df`` audit shape (:240-289).

Scale: row rules fuse into the scan (whole-stage codegen, no shuffle);
the uniqueness rule shuffles on its key subset only. The failures union
re-reads the flagged plan per rule — Catalyst reuses the scan subplan
(ReusedExchange) rather than rescanning per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.registry import query
from olympic_athletes_etl_spark.plans.tables import load
from olympic_athletes_etl_spark.validate import Rule, RuleSet, unique_rule


def _orders_rules() -> RuleSet:
    """Reference-shaped rules transplanted onto ``orders``:
    isin (Sex∈{M,F} analogue), value range (year/BMI analogue),
    cross-column (died≥born analogue), uniqueness (Athlete_Id analogue)."""
    return RuleSet(
        [
            Rule(
                "status_valid",
                lambda df: F.col("o_orderstatus").isin("F", "O", "P"),
                ("o_orderstatus",),
            ),
            Rule(
                "price_range",
                lambda df: F.col("o_totalprice").between(1000, 400000),
                ("o_totalprice",),
            ),
            Rule(
                "priority_prefix_digit",
                lambda df: F.col("o_orderpriority").rlike("^[1-5]-"),
                ("o_orderpriority",),
            ),
            Rule(
                "date_in_epoch",
                lambda df: F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
                ("o_orderdate",),
            ),
            unique_rule("unique_orderkey", ("o_orderkey",)),
        ]
    )


@query(
    "v_rule_summary",
    oracle="""
    WITH t AS (
      SELECT *,
        (o_orderstatus IN ('F','O','P'))                    AS p_status,
        (o_totalprice BETWEEN 1000 AND 400000)              AS p_price,
        regexp_matches(o_orderpriority, '^[1-5]-')          AS p_prio,
        (o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31') AS p_date,
        (count(*) OVER (PARTITION BY o_orderkey) = 1)       AS p_uniq
      FROM orders
    )
    SELECT 'status_valid' AS rule, count(*) AS n_checked,
           count(*) FILTER (WHERE NOT coalesce(p_status, TRUE)) AS n_failed FROM t
    UNION ALL
    SELECT 'price_range', count(*),
           count(*) FILTER (WHERE NOT coalesce(p_price, TRUE)) FROM t
    UNION ALL
    SELECT 'priority_prefix_digit', count(*),
           count(*) FILTER (WHERE NOT coalesce(p_prio, TRUE)) FROM t
    UNION ALL
    SELECT 'date_in_epoch', count(*),
           count(*) FILTER (WHERE NOT coalesce(p_date, TRUE)) FROM t
    UNION ALL
    SELECT 'unique_orderkey', count(*),
           count(*) FILTER (WHERE NOT coalesce(p_uniq, TRUE)) FROM t
    """,
)
def v_rule_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return _orders_rules().summary(orders)


@query(
    "v_failure_cases",
    oracle="""
    WITH t AS (SELECT * FROM orders)
    SELECT 'price_range' AS failed_check, o_orderkey, o_custkey
    FROM t WHERE NOT coalesce(o_totalprice BETWEEN 1000 AND 400000, TRUE)
    UNION ALL
    SELECT 'date_in_epoch', o_orderkey, o_custkey
    FROM t
    WHERE NOT coalesce(
      o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31', TRUE)
    """,
)
def v_failure_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit-table shape, restricted to the two range rules (they are
    the ones with data-dependent failures worth auditing here)."""
    orders = load(spark, sf_dir, "orders")
    rules = RuleSet(
        [
            Rule(
                "price_range",
                lambda df: F.col("o_totalprice").between(1000, 400000),
                (),
            ),
            Rule(
                "date_in_epoch",
                lambda df: F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
                (),
            ),
        ]
    )
    return rules.failures(orders, context_cols=["o_orderkey", "o_custkey"]).drop(
        "scope_values"
    )


# --------------------------------------------------------------------------
# Distribution drift between two data slices — integer total variation
# --------------------------------------------------------------------------
@query(
    "v_histogram_drift",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) // 2500 AS bucket,
             CAST(count(*) FILTER (isodow(ts) <= 5) AS BIGINT) AS n_wd,
             CAST(count(*) FILTER (isodow(ts) > 5) AS BIGINT) AS n_we
      FROM events GROUP BY 1, 2
    ),
    tots AS (
      SELECT event_type, CAST(sum(n_wd) AS BIGINT) AS tot_wd,
             CAST(sum(n_we) AS BIGINT) AS tot_we
      FROM cells GROUP BY 1
    ),
    diffs AS (
      SELECT c.event_type, c.bucket, t.tot_wd, t.tot_we,
             abs(c.n_wd * t.tot_we - c.n_we * t.tot_wd) AS d
      FROM cells c JOIN tots t USING (event_type)
    )
    SELECT event_type,
           CAST(min(tot_wd) AS BIGINT) AS n_weekday,
           CAST(min(tot_we) AS BIGINT) AS n_weekend,
           CAST(1000 * sum(d) // (2 * min(tot_wd) * min(tot_we)) AS BIGINT)
             AS tv_permille,
           CAST(first(bucket ORDER BY d DESC, bucket ASC) AS BIGINT)
             AS top_drift_bucket
    FROM diffs
    WHERE tot_wd > 0 AND tot_we > 0
    GROUP BY event_type
    """,
)
def v_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-vs-weekend value-distribution drift per event type: the
    $25-bucket histograms of the two slices are compared by TOTAL
    VARIATION distance, computed entirely in integers — per bucket
    |n_wd*N_we - n_we*N_wd|, summed and scaled to permille only at the
    end — so the drift score is bit-reproducible (the production use is
    alerting on ingest-batch drift against a reference window, where a
    float-flickering metric means flapping alerts). The top drifting
    bucket is reported with a deterministic tie-break (highest
    cross-difference, then lowest bucket).

    Scale shape: one map-side-combinable groupBy to the (type, bucket)
    grid — bounded by value range, not event count — then
    grid-cardinality aggregates; nothing downstream of the first
    aggregation grows with the data. Overflow: the cross-difference is
    bounded by N_wd*N_we, so BIGINT holds to ~1e9 rows per slice
    before the permille scaling; past that, descale the counts first
    (documented headroom, same discipline as the moment queries)."""
    ev = load(spark, sf_dir, "events")
    is_wd = F.expr("weekday(ts) < 5")
    cells = ev.groupBy(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT) div 2500").alias("bucket"),
    ).agg(
        F.sum(F.when(is_wd, 1).otherwise(0)).alias("n_wd"),
        F.sum(F.when(is_wd, 0).otherwise(1)).alias("n_we"),
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("n_wd").alias("tot_wd"), F.sum("n_we").alias("tot_we")
    )
    diffs = cells.join(F.broadcast(tots), "event_type").withColumn(
        "d",
        F.abs(
            F.col("n_wd") * F.col("tot_we") - F.col("n_we") * F.col("tot_wd")
        ),
    )
    return (
        diffs.filter((F.col("tot_wd") > 0) & (F.col("tot_we") > 0))
        .groupBy("event_type")
        .agg(
            F.min("tot_wd").alias("n_weekday"),
            F.min("tot_we").alias("n_weekend"),
            F.expr(
                "CAST(1000 * sum(d) div (2 * min(tot_wd) * min(tot_we))"
                " AS BIGINT)"
            ).alias("tv_permille"),
            F.max_by(
                "bucket", F.struct(F.col("d").alias("d"), (-F.col("bucket")).alias("nb"))
            ).cast("bigint").alias("top_drift_bucket"),
        )
    )


# --------------------------------------------------------------------------
# Benford first-digit screen — audit analytics over money columns
# --------------------------------------------------------------------------
@query(
    "v_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice >= 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM d)
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST((10000 * count(*)) // max(n.total) AS BIGINT)
             AS share_x10000
    FROM d CROSS JOIN n
    GROUP BY digit
    """,
)
def v_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals — the
    Benford's-law screen auditors run over money columns (organic
    amounts follow log10(1+1/d); fabricated or capped data shows up as
    a flat or spiked digit histogram). Output is the digit histogram
    with exact x10000 integer shares; judging the deviation against
    the Benford reference is the consumer's call (the histogram itself
    is the auditable artifact, and keeping it integer keeps it
    hash-gated).

    Plan: the digit is string-head arithmetic on the floored amount
    (map-side, no UDF), one 9-bucket map-side-combinable aggregate, the
    total a 1-row broadcast — bounded output regardless of fact size,
    the same shape as a_value_counts."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("CAST((10000 * count(1)) div max(total) AS BIGINT)").alias(
                "share_x10000"
            ),
        )
    )
