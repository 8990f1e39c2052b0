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
from pyspark.sql.window import Window

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


# --------------------------------------------------------------------------
# Exact AUC — Mann-Whitney midranks over distinct-score counts
# --------------------------------------------------------------------------
_AUC_HORIZON_DAYS = 180


@query(
    "v_auc_score",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS score,
             o_orderkey
      FROM orders
    ),
    labeled AS (
      SELECT score,
             CASE WHEN lead(day) OVER (PARTITION BY o_custkey
                                       ORDER BY day, o_orderkey) - day
                       <= {_AUC_HORIZON_DAYS}
                  THEN 1 ELSE 0 END AS y
      FROM o
    ),
    vc AS (
      SELECT score, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS n1
      FROM labeled GROUP BY 1
    ),
    cum AS (
      SELECT score, cnt, n1,
             CAST(sum(cnt) OVER (ORDER BY score) AS BIGINT) AS cum
      FROM vc
    ),
    agg AS (
      SELECT CAST(sum(n1) AS BIGINT) AS npos,
             CAST(sum(cnt - n1) AS BIGINT) AS nneg,
             -- 2*sum of positive midranks: midrank*2 = 2*(cum-cnt)+cnt+1
             CAST(sum(n1 * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS r1x2
      FROM cum
    )
    SELECT npos AS n_pos, nneg AS n_neg,
           CAST((10000 * (r1x2 - npos * (npos + 1)))
                // (2 * npos * nneg) AS BIGINT) AS auc_x10000
    FROM agg
    """,
)
def v_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT AUC at fact scale — does order value predict a repeat
    purchase within {h} days? AUC computed by the Mann-Whitney rank
    identity AUC = (R1 - n1(n1+1)/2) / (n1*n0) with TIE-CORRECTED
    midranks, all in integers (doubled midranks keep half-ranks exact;
    result scaled x10000) so both engines agree bit-for-bit.

    The scale move: never rank rows. Scores collapse to DISTINCT-value
    (count, positive-count) pairs first; the rank structure lives
    entirely in a cumsum over that value-domain-bounded table (the
    partitioned two-pass operator), and every group's midrank is
    derived arithmetically — the classic sort-all-predictions AUC is a
    single-reducer sort this query never performs. Overflow bound:
    sum(n1 * 2*midrank) <= 2*n*n1 — holds to ~2e9 rows; past that,
    compute AUC on a quantile-bucketed score grid (the a_gini_spend
    escape hatch).

    The label is the q_churn_training_set forward label (lead() per
    customer, final order = 0); the score deliberately uses only the
    current row — features backward, labels forward."""
    from olympic_athletes_etl_spark.operators.windows import (
        partitioned_running_sum,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("score"),
    )
    nxt = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    labeled = o.select(
        "score",
        F.when(
            F.lead("day").over(nxt) - F.col("day") <= _AUC_HORIZON_DAYS,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    vc = labeled.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("n1"),
    )
    cum = partitioned_running_sum(
        vc,
        bucket=F.expr("score div 1000000"),
        order_cols=["score"],
        value_col="cnt",
        out_col="cum",
    )
    agg = cum.agg(
        F.sum("n1").cast("long").alias("npos"),
        F.sum(F.expr("cnt - n1")).cast("long").alias("nneg"),
        F.sum(F.expr("n1 * (2 * (cum - cnt) + cnt + 1)"))
        .cast("long")
        .alias("r1x2"),
    )
    return agg.select(
        F.col("npos").alias("n_pos"),
        F.col("nneg").alias("n_neg"),
        F.expr(
            "CAST((10000 * (r1x2 - npos * (npos + 1)))"
            " div (2 * npos * nneg) AS BIGINT)"
        ).alias("auc_x10000"),
    )


v_auc_score.__doc__ = v_auc_score.__doc__.format(h=_AUC_HORIZON_DAYS)


# --------------------------------------------------------------------------
# Decile lift table — threshold-bucketed targeting quality
# --------------------------------------------------------------------------
@query(
    "v_decile_lift",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS score,
             o_orderkey
      FROM orders
    ),
    labeled AS (
      SELECT score,
             CASE WHEN lead(day) OVER (PARTITION BY o_custkey
                                       ORDER BY day, o_orderkey) - day
                       <= {_AUC_HORIZON_DAYS}
                  THEN 1 ELSE 0 END AS y
      FROM o
    ),
    vc AS (
      SELECT score, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS n1
      FROM labeled GROUP BY 1
    ),
    cum AS (
      SELECT score, cnt, n1,
             CAST(sum(cnt) OVER (ORDER BY score) AS BIGINT) AS cum
      FROM vc
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                 CAST(sum(n1) AS BIGINT) AS npos FROM vc),
    cuts AS (
      SELECT {", ".join(
        f"(SELECT min(score) FROM cum, n WHERE cum >= ({q} * n + 9) // 10)"
        f" AS t{q}"
        for q in range(1, 10)
      )}
    )
    SELECT CAST(1 {" ".join(
        f"+ CAST(score > t{q} AS INT)" for q in range(1, 10)
      )} AS BIGINT) AS decile,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(sum(n1) AS BIGINT) AS n_pos,
           CAST((10000 * sum(n1)) // sum(cnt) AS BIGINT) AS rate_x10000,
           CAST((10000 * CAST(sum(n1) AS HUGEINT) * (SELECT n FROM n))
                // (CAST(sum(cnt) AS HUGEINT) * (SELECT npos FROM n))
                AS BIGINT)
             AS lift_x10000
    FROM vc, cuts
    GROUP BY 1
    """,
)
def v_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECILE LIFT TABLE for the v_auc_score signal: rows bucketed into
    score deciles by GLOBAL exact order-statistic thresholds (the
    q_rfm_segments convention — broadcast scalars, never a global
    ntile sort), with per-decile positive rate and lift vs the base
    rate as exact x10000 integers. The campaign-targeting readout:
    'mail deciles 9-10, their repeat-rate is N× base'.

    Everything computes on the distinct-score (cnt, n1) table — the
    decile label, the rates, the lift — so after the initial label
    window the fact rows are never touched again; ties share a decile
    (thresholded buckets are deterministic under ties where ntile is
    not). Lift divides AFTER multiplying by the 1-row totals, keeping
    the arithmetic integer-exact in both engines."""
    from olympic_athletes_etl_spark.operators.windows import (
        partitioned_running_sum,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("score"),
    )
    nxt = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    labeled = o.select(
        "score",
        F.when(
            F.lead("day").over(nxt) - F.col("day") <= _AUC_HORIZON_DAYS,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    vc = (
        labeled.groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("y").cast("long").alias("n1"),
        )
        .localCheckpoint(eager=True)
    )
    cum = partitioned_running_sum(
        vc,
        bucket=F.expr("score div 1000000"),
        order_cols=["score"],
        value_col="cnt",
        out_col="cum",
    )
    nn = vc.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("n1").cast("long").alias("npos"),
    )
    cuts = cum.crossJoin(F.broadcast(nn)).agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({q} * n + 9) div 10"),
                    F.col("score"),
                )
            ).alias(f"t{q}")
            for q in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for q in range(1, 10):
        decile = decile + (F.col("score") > F.col(f"t{q}")).cast("int")
    return (
        vc.crossJoin(F.broadcast(cuts))
        .crossJoin(F.broadcast(nn))
        .groupBy(decile.cast("long").alias("decile"))
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.sum("n1").cast("long").alias("n_pos"),
            F.expr("CAST((10000 * sum(n1)) div sum(cnt) AS BIGINT)").alias(
                "rate_x10000"
            ),
            # lift multiplies two fact-scale counts before dividing, so
            # it runs in exact wide integers (DECIMAL(38,0) here,
            # HUGEINT in the oracle) — the BIGINT form overflows at
            # ~3e7 rows (10000 * npos * n > 2^63), the a_gini_spend
            # sf0.1 lesson applied one query over
            F.expr(
                "CAST((10000 * CAST(sum(n1) AS DECIMAL(38,0)) * first(n))"
                " div (CAST(sum(cnt) AS DECIMAL(38,0)) * first(npos))"
                " AS BIGINT)"
            ).alias("lift_x10000"),
        )
    )


# --------------------------------------------------------------------------
# Experiment analysis — 2x2 chi-square on a deterministic hash split
# --------------------------------------------------------------------------
@query(
    "v_chi2_experiment",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             o_orderkey
      FROM orders
    ),
    labeled AS (
      SELECT o_custkey % 2 AS arm,
             CASE WHEN lead(day) OVER (PARTITION BY o_custkey
                                       ORDER BY day, o_orderkey) - day
                       <= {_AUC_HORIZON_DAYS}
                  THEN 1 ELSE 0 END AS y
      FROM o
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM labeled
    )
    SELECT a, b, c, d,
           CAST((10000 * a) // (a + b) AS BIGINT) AS rate0_x10000,
           CAST((10000 * c) // (c + d) AS BIGINT) AS rate1_x10000,
           round(CAST(a + b + c + d AS DOUBLE)
                 * CAST(CAST(a AS HUGEINT) * d
                        - CAST(b AS HUGEINT) * c AS DOUBLE)
                 * CAST(CAST(a AS HUGEINT) * d
                        - CAST(b AS HUGEINT) * c AS DOUBLE)
                 / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)),
                 4) AS chi2
    FROM cells
    """,
)
def v_chi2_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPERIMENT READOUT: 2x2 chi-square test of independence between
    a deterministic 50/50 assignment (custkey parity — the hash-split
    convention: assignment must be reproducible across reruns and
    engines, never rand()) and the repeat-purchase outcome. Reports the
    contingency cells, per-arm conversion as exact x10000 integers, and
    the chi-square statistic chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)).

    Determinism note: the cells are EXACT BIGINT counts; chi2 is then
    one scalar IEEE-double expression over those four integers —
    identical operand order in both engines, so it is bit-stable
    WITHOUT any sum-order caveat (the float-trap rule only bites when
    doubles are AGGREGATED; here doubles appear strictly after all
    aggregation). The determinant ad-bc is computed in EXACT wide
    integers (DECIMAL(38,0) Spark-side, HUGEINT oracle-side — the
    a_gini_spend/v_decile_lift widening) and cast to double ONCE: a
    double-side determinant loses exactness above 2^53 precisely where
    chi2 is near 0 (ad ~ bc, catastrophic cancellation), and BIGINT
    overflows at per-cell counts ~3e9; the wide-integer subtraction is
    exact to 38 digits, far beyond any 100 TB cell count. Scale: one
    window for the label
    (customer-partitioned), one map-side-combinable 4-cell aggregate;
    output is a single row."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    nxt = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    labeled = o.select(
        (F.col("o_custkey") % 2).alias("arm"),
        F.when(
            F.lead("day").over(nxt) - F.col("day") <= _AUC_HORIZON_DAYS,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    cells = labeled.agg(
        F.sum(F.expr("CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("a"),
        F.sum(F.expr("CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("b"),
        F.sum(F.expr("CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("c"),
        F.sum(F.expr("CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("d"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr("CAST((10000 * a) div (a + b) AS BIGINT)").alias(
            "rate0_x10000"
        ),
        F.expr("CAST((10000 * c) div (c + d) AS BIGINT)").alias(
            "rate1_x10000"
        ),
        F.round(
            F.expr(
                "CAST(a + b + c + d AS DOUBLE)"
                " * CAST(CAST(a AS DECIMAL(38,0)) * d"
                "        - CAST(b AS DECIMAL(38,0)) * c AS DOUBLE)"
                " * CAST(CAST(a AS DECIMAL(38,0)) * d"
                "        - CAST(b AS DECIMAL(38,0)) * c AS DOUBLE)"
                " / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)"
                "    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))"
            ),
            4,
        ).alias("chi2"),
    )


# --------------------------------------------------------------------------
# Order-velocity screen — same payer ordering again within a week
# --------------------------------------------------------------------------
_VELOCITY_WINDOW_DAYS = 7


@query(
    "v_rapid_repeat_orders",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS day
      FROM orders
    ),
    seq AS (
      SELECT o_orderkey, o_custkey, cents, day,
             lag(day) OVER w AS prev_day,
             lag(o_orderkey) OVER w AS prev_key,
             lag(cents) OVER w AS prev_cents
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
    )
    SELECT o_custkey, prev_key AS first_orderkey,
           o_orderkey AS second_orderkey,
           CAST(day - prev_day AS BIGINT) AS gap_days,
           prev_cents AS first_cents, cents AS second_cents
    FROM seq
    WHERE prev_day IS NOT NULL
      AND day - prev_day <= {_VELOCITY_WINDOW_DAYS}
    """,
)
def v_rapid_repeat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-VELOCITY SCREEN: consecutive orders by the same customer
    within {d} days — the audit feed behind double-charge review and
    abuse velocity rules (both amounts reported so the reviewer sees
    exact-duplicate candidates immediately; exact-amount equality is
    NOT required upstream because real double-charges differ by
    shipping or tax more often than not). The naive form is an O(n²)
    self-join on customer with a date-band predicate; this plan is ONE
    customer-keyed window with lag() — each row checks only its
    immediate predecessor, sufficient because rapid CHAINS still
    surface as consecutive pairs. Amounts carried as exact integer
    cents; one fact shuffle total."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    seq = o.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lag("cents").over(w).alias("prev_cents"),
    )
    return seq.filter(
        F.col("prev_day").isNotNull()
        & (F.col("day") - F.col("prev_day") <= _VELOCITY_WINDOW_DAYS)
    ).select(
        "o_custkey",
        F.col("prev_key").alias("first_orderkey"),
        F.col("o_orderkey").alias("second_orderkey"),
        (F.col("day") - F.col("prev_day")).cast("long").alias("gap_days"),
        F.col("prev_cents").alias("first_cents"),
        F.col("cents").alias("second_cents"),
    )


v_rapid_repeat_orders.__doc__ = v_rapid_repeat_orders.__doc__.format(
    d=_VELOCITY_WINDOW_DAYS
)
