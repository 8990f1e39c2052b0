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
