"""Scalar-function suite (SURVEY.md §2.8, C1-C17).

Every scalar family the reference uses — regex replace/extract, split,
trim/lower, concat, rlike, date parsing, casts, conditionals, coalesce,
null predicates, arithmetic/pow, between, isin, length, cross-column
comparisons — expressed as named queries with DuckDB oracles.

Cross-engine parity decisions (SURVEY §7 decision log):
- C2: Spark ``regexp_extract`` returns ``''`` on no-match (pandas gives
  NaN) → both sides wrap with ``nullif(…, '')``.
- C8: bare-year date strings parse via an explicit ``to_date(c,'yyyy')``
  fallback (CORRECTED parser policy, never LEGACY).
- DuckDB ``regexp_replace`` is first-match-only by default → oracles pass
  the ``'g'`` flag to match Spark's replace-all.

All scalar work here is JVM-side whole-stage-codegen — zero Python UDFs —
so at 100 TB these pipelines are scan-bound, not CPU-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.plans.registry import query
from olympic_athletes_etl_spark.plans.tables import load


# --------------------------------------------------------------------------
# C1/C4/C5 — regex replace + trim + lower
# --------------------------------------------------------------------------
@query(
    "c_regex_clean",
    oracle="""
    SELECT p_partkey,
           regexp_replace(lower(trim(p_name)), '[aeiou]', '*', 'g') AS scrubbed,
           length(p_name) AS name_len
    FROM part
    """,
)
def c_regex_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex replace-all + trim + lower (C1/C4/C5; reference:
    data_clean_glue.py:26-30,40,91 strips bullets/units/whitespace)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace(F.lower(F.trim(F.col("p_name"))), "[aeiou]", "*").alias("scrubbed"),
        F.length("p_name").alias("name_len"),
    )


# --------------------------------------------------------------------------
# C2 — regex extract with null-on-no-match normalization
# --------------------------------------------------------------------------
@query(
    "c_regex_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(nullif(regexp_extract(o_orderpriority, '(\\d+)', 1), '') AS INTEGER) AS pri_num,
           nullif(regexp_extract(o_orderpriority, '-([A-Z]+)$', 1), '') AS pri_word
    FROM orders
    """,
)
def c_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction (C2; reference: data_clean_glue.py:48-54,
    72-80 extracts dates/birthplaces). ``nullif(…,'')`` pins the
    empty-string-vs-null divergence flagged in SURVEY §7."""
    orders = load(spark, sf_dir, "orders")
    num = F.nullif(F.regexp_extract("o_orderpriority", r"(\d+)", 1), F.lit(""))
    word = F.nullif(F.regexp_extract("o_orderpriority", r"-([A-Z]+)$", 1), F.lit(""))
    return orders.select(
        "o_orderkey",
        num.cast("int").alias("pri_num"),
        word.alias("pri_word"),
    )


# --------------------------------------------------------------------------
# C3 — split + element access (first / last)
# --------------------------------------------------------------------------
@query(
    "c_split_element",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_type, ' ') AS parts FROM part)
    SELECT p_partkey, parts[1] AS first_word, parts[len(parts)] AS last_word,
           len(parts) AS n_parts
    FROM t
    """,
)
def c_split_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split + element access (C3; reference: data_clean_glue.py:35-43
    splits '180 cm / 75 kg' measurements)."""
    part = load(spark, sf_dir, "part")
    parts = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        parts.getItem(0).alias("first_word"),
        F.element_at(parts, F.size(parts)).alias("last_word"),
        F.size(parts).alias("n_parts"),
    )


# --------------------------------------------------------------------------
# C6 — concat / concat_ws + substring
# --------------------------------------------------------------------------
@query(
    "c_concat_label",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_mktsegment, upper(c_name)) AS label,
           substring(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
)
def c_concat_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat + substring (C6; reference: data_clean_glue.py:497-507,540
    rebuilds competition text / date strings)."""
    customer = load(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.concat_ws("|", F.col("c_mktsegment"), F.upper("c_name")).alias("label"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


# --------------------------------------------------------------------------
# C7 — rlike regex predicate
# --------------------------------------------------------------------------
@query(
    "c_rlike_flag",
    oracle="""
    SELECT regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel, count(*) AS n
    FROM part GROUP BY 1
    """,
)
def c_rlike_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (C7; reference: tie detection via rlike '=.*',
    data_clean_glue.py:445)."""
    part = load(spark, sf_dir, "part")
    return (
        part.groupBy(F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# C8 — date parsing with bare-year fallback (CORRECTED policy)
# --------------------------------------------------------------------------
@query(
    "c_date_parse",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, substring(CAST(o_orderdate AS VARCHAR), 1, 10) AS ds
      FROM orders
    )
    SELECT o_orderkey,
           CAST(CAST(ds AS DATE) AS VARCHAR) AS full_date,
           CAST(make_date(CAST(substring(ds, 1, 4) AS INTEGER), 1, 1) AS VARCHAR) AS year_date
    FROM t
    """,
)
def c_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern date parse + bare-year fallback (C8; reference:
    data_clean_glue.py:57-65,533-545 uses LEGACY parser — we pin CORRECTED
    and express the bare-year case as ``to_date(c,'yyyy')``, SURVEY §7)."""
    orders = load(spark, sf_dir, "orders")
    ds = F.substring(F.col("o_orderdate").cast("string"), 1, 10)
    t = orders.select("o_orderkey", ds.alias("ds"))
    return t.select(
        "o_orderkey",
        F.to_date("ds", "yyyy-MM-dd").cast("string").alias("full_date"),
        F.to_date(F.substring("ds", 1, 4), "yyyy").cast("string").alias("year_date"),
    )


# --------------------------------------------------------------------------
# C10/C14/C15 — conditional bucketing + between + isin
# --------------------------------------------------------------------------
@query(
    "c_conditional_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 20000 THEN 'low'
                WHEN o_totalprice < 100000 THEN 'mid'
                ELSE 'high' END AS bucket,
           o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 500000
    GROUP BY 1, 2
    """,
)
def c_conditional_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise + between + isin (C10/C14/C15; reference:
    data_clean_glue.py:166-175,493-509; validation ranges
    data_quality_and_validation.py:41-55,151)."""
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 20000, "low")
        .when(F.col("o_totalprice") < 100000, "mid")
        .otherwise("high")
    )
    return (
        orders.filter(F.col("o_totalprice").between(1000, 500000))
        .groupBy(
            bucket.alias("bucket"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
                " AS DOUBLE) / 100.0"
            ).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# C11/C12 — coalesce + null predicates
# --------------------------------------------------------------------------
@query(
    "c_coalesce_impute",
    oracle="""
    WITH t AS (
      SELECT s_suppkey, CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS bal
      FROM supplier
    ), stats AS (SELECT round(avg(bal), 2) AS mean_bal FROM t WHERE bal IS NOT NULL)
    SELECT s_suppkey,
           round(coalesce(bal, mean_bal), 2) AS bal_imputed,
           bal IS NULL AS was_imputed
    FROM t CROSS JOIN stats
    """,
)
def c_coalesce_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce-based imputation + imputed-flag (C11/C12; reference:
    data_clean_II_glue.py:82-92,119-127 imputes medians + flags). The
    scalar stat is a 1-row broadcast cross-join — no driver collect."""
    supplier = load(spark, sf_dir, "supplier")
    t = supplier.select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, None).otherwise(F.col("s_acctbal")).alias("bal"),
    )
    stats = t.filter(F.col("bal").isNotNull()).agg(
        F.round(F.avg("bal"), 2).alias("mean_bal")
    )
    return t.crossJoin(F.broadcast(stats)).select(
        "s_suppkey",
        F.round(F.coalesce("bal", "mean_bal"), 2).alias("bal_imputed"),
        F.col("bal").isNull().alias("was_imputed"),
    )


# --------------------------------------------------------------------------
# C13 — arithmetic + pow
# --------------------------------------------------------------------------
@query(
    "c_math_ratio",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(pow(l_quantity, 2) / (l_extendedprice / 100.0 + 1.0), 6) AS ratio
    FROM lineitem
    """,
)
def c_math_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column arithmetic + pow (C13; reference BMI check
    data_quality_and_validation.py:38-43)."""
    lineitem = load(spark, sf_dir, "lineitem")
    ratio = F.pow("l_quantity", F.lit(2)) / (F.col("l_extendedprice") / 100.0 + 1.0)
    return lineitem.select(
        "l_orderkey", "l_linenumber", F.round(ratio, 6).alias("ratio")
    )


# --------------------------------------------------------------------------
# C16 — string length predicate
# --------------------------------------------------------------------------
@query(
    "c_length_check",
    oracle="""
    SELECT length(p_brand) AS brand_len, length(p_brand) = 8 AS is_std, count(*) AS n
    FROM part GROUP BY 1, 2
    """,
)
def c_length_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length predicate (C16; reference: 3-char country codes,
    data_quality_and_validation.py:65,102,139)."""
    part = load(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.length("p_brand").alias("brand_len"),
            (F.length("p_brand") == 8).alias("is_std"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# C17 — cross-column date logic (interval arithmetic)
# --------------------------------------------------------------------------
@query(
    "c_cross_col_dates",
    oracle="""
    SELECT (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late_ship, count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def c_cross_col_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-column date comparison with interval arithmetic (C17;
    reference: died ≥ born / opened ≤ closed checks,
    data_quality_and_validation.py:31-35,179-198)."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(late.alias("late_ship"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
