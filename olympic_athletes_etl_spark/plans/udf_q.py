"""U1 — the reference's one real UDF, on the correctness surface.

NOC canonicalization (reference: pandas_based/src/data_clean.py:172-256
``noc_parsing``; Glue twin data_clean_glue.py:200-284) is inherently
procedural — ordered legacy-name substring rewrites, then a
longest-match-first scan that REMOVES each match before rescanning. Per
SURVEY §7 it is registered WITHOUT a SQL oracle (rows-only check): the
value-level semantics are pinned by tests/test_etl_impute.py against
hand-computed expectations instead.

The "country list" here is the nation table's 25 names; the input
strings are deterministic multi-country compounds built from nation ×
region, exercising every branch: multi-match, separator forms, the
legacy rewrite, and the no-match passthrough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.etl.noc import canonicalize_noc_udf
from olympic_athletes_etl_spark.plans.registry import query
from olympic_athletes_etl_spark.plans.tables import load


@query("u_noc_canonicalize", oracle=None)
def u_noc_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize synthetic NOC strings: ``"<A> and <B>"`` /
    ``"<A>/<B>"`` / ``"<A>, <B> team"`` per row, where A is the nation's
    name and B the nation 7·key+3 (mod 25) away. The UDF returns the
    sorted comma-joined set of recognized names. The 25-name list rides
    the UDF closure (auto-broadcast — reference explicitly broadcasts,
    data_clean_glue.py:279-280)."""
    nation = load(spark, sf_dir, "nation")
    names = [r[0] for r in nation.select("n_name").collect()]  # 25-row dim
    other = nation.select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("other_name")
    )
    pairs = (
        nation.withColumn("k2", (F.col("n_nationkey") * 7 + 3) % 25)
        .join(F.broadcast(other), on="k2")
        .select("n_nationkey", "n_name", "other_name")
    )
    compound = (
        F.when(
            F.col("n_nationkey") % 3 == 0,
            F.concat(F.col("n_name"), F.lit(" and "), F.col("other_name")),
        )
        .when(
            F.col("n_nationkey") % 3 == 1,
            F.concat(F.col("n_name"), F.lit("/"), F.col("other_name")),
        )
        .otherwise(F.concat(F.col("n_name"), F.lit(", "), F.col("other_name"), F.lit(" team")))
    )
    udf = canonicalize_noc_udf(names)
    return (
        pairs.withColumn("noc_raw", compound)
        .select("n_nationkey", udf(F.col("noc_raw")).alias("noc_canon"))
    )
