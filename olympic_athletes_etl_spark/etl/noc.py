"""NOC canonicalization (U1 — SURVEY.md §2.11; reference:
pandas_based/src/data_clean.py:172-256 ``noc_parsing`` / the Glue UDF
variant aws_migration/src/data_clean_glue.py:200-284, which is written
but commented out at its call site :303).

Semantics (inherently procedural — order matters):

1. lowercase + trim;
2. rewrite legacy/historical country names (substring replace, in the
   declared map order);
3. normalize separators (``/,;`` and the word ``and`` → space);
4. scan for known country names LONGEST-FIRST, removing each match so a
   shorter name can't re-match inside it;
5. emit the sorted, comma-joined set of matches — or the cleaned
   original string when nothing matched.

Two implementations:

- ``canonicalize_noc_udf`` — the authoritative one: a scalar Python UDF
  exactly implementing the procedural spec. Slow path (per-row Python);
  acceptable because NOC strings are short and the column is processed
  once per pipeline run, not per query. Excluded from the SQL-oracle set
  (rows-only check) per SURVEY §7.
- ``canonicalize_noc_df`` — pure-DataFrame variant for the 100 TB path:
  legacy rewrite via chained ``regexp_replace``, candidate matching via a
  broadcast join on word-boundary ``rlike``, longest-match-first
  approximated by discarding any match contained (word-bounded) inside a
  longer match on the same row. Agrees with the UDF whenever overlapping
  matches only nest by containment — true for the ISO name list.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: legacy/historical name → modern equivalent, in rewrite order
#: (data_clean.py:186-220 / data_clean_glue.py:200-233 — semantic data,
#: not code; order preserved because replaces cascade).
LEGACY_NOC_MAP: tuple[tuple[str, str], ...] = (
    ("west germany", "germany"),
    ("east germany", "germany"),
    ("germany west germany", "germany"),
    ("germany saar", "germany"),
    ("german democratic republic", "germany"),
    ("saar", "germany"),
    ("soviet union", "russian federation"),
    ("ussr", "russian federation"),
    ("unified team", "russian federation"),
    ("czechoslovakia", "czechia"),
    ("bohemia", "czechia"),
    ("yugoslavia", "serbia"),
    ("serbia and montenegro", "serbia"),
    ("rhodesia", "zimbabwe"),
    ("malaya", "malaysia"),
    ("north yemen", "yemen"),
    ("south yemen", "yemen"),
    ("burma", "myanmar"),
    ("peoples republic of china", "china"),
    ("republic of korea", "south korea"),
    ("korea team", "south korea"),
    ("democratic people's republic of korea", "north korea"),
    ("islamic republic of iran", "iran"),
    ("kingdom of saudi arabia", "saudi arabia"),
    ("united arab republic", "egypt"),
    ("republic of moldova", "moldova"),
    ("roc", "russian federation"),
    ("great britain", "united kingdom"),
    ("the bahamas", "bahamas"),
    ("hong kong, china", "hong kong"),
    ("taiwan", "chinese taipei"),
    ("viet nam", "vietnam"),
)


def _canonicalize(noc_str: str | None, countries_longest_first: Sequence[str]) -> str:
    if noc_str is None:
        return ""
    s = noc_str.lower().strip()
    for old, new in LEGACY_NOC_MAP:
        if old in s:
            s = s.replace(old, new)
    s = re.sub(r"[/,;]", " ", s)
    s = re.sub(r"\band\b", " ", s)
    s = re.sub(r"\s+", " ", s).strip()
    found = set()
    for country in countries_longest_first:
        pattern = rf"(?<!\w){re.escape(country)}(?!\w)"
        if re.search(pattern, s):
            found.add(country)
            s = re.sub(pattern, " ", s)
    if not found:
        return re.sub(r"\s+", " ", noc_str.lower().strip())
    return ",".join(sorted(found))


def canonicalize_noc_udf(valid_countries: Sequence[str]) -> Column:
    """Build the scalar UDF over a captured (auto-broadcast) country
    list; apply as ``df.withColumn("NOC", canonicalize_noc_udf(cs)(F.col("NOC")))``."""
    countries = sorted({c.lower().strip() for c in valid_countries}, key=len, reverse=True)

    @F.udf(returnType=StringType())
    def _udf(noc_str):
        return _canonicalize(noc_str, countries)

    return _udf


def canonicalize_noc_df(
    df: DataFrame,
    iso: DataFrame,
    noc_col: str = "NOC",
    name_col: str = "English short name lower case",
) -> DataFrame:
    """Whole-stage-codegen-friendly variant: no Python in the scan path.

    One broadcast nested-loop rlike join against the ~250-row country dim,
    one groupBy on the row id. At 100 TB this is scan-bound; the UDF
    variant would serialize every row through a Python worker.
    """
    normalized = F.lower(F.trim(F.col(noc_col)))
    for old, new in LEGACY_NOC_MAP:
        normalized = F.regexp_replace(normalized, re.escape(old), new)
    normalized = F.regexp_replace(normalized, r"[/,;]", " ")
    normalized = F.regexp_replace(normalized, r"\band\b", " ")
    normalized = F.trim(F.regexp_replace(normalized, r"\s+", " "))

    # localCheckpoint PINS the generated row ids: the id expression is
    # otherwise re-evaluated independently on each side of the
    # matches/survivors self-join below, and a retry or changed scan
    # split could assign different ids per side (the same hazard that
    # bans monotonically_increasing_id for surrogate keys — SURVEY §7).
    work = (
        df.withColumn("__noc_norm", normalized)
        .withColumn("__row_id", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    # the country dim is tiny (~250 rows): collect once, pre-escape the
    # word-boundary patterns driver-side, broadcast back (SURVEY §4 —
    # driver-side collect sanctioned for small dims only)
    names = sorted(
        {
            r[0].lower().strip()
            for r in iso.select(name_col).dropna().distinct().collect()
        }
    )
    spark = df.sparkSession
    countries = F.broadcast(
        spark.createDataFrame(
            [(n, rf"(?<!\w){re.escape(n)}(?!\w)") for n in names],
            ["__country", "__pattern"],
        )
    )
    matches = work.join(
        countries, F.regexp_like(F.col("__noc_norm"), F.col("__pattern")), "inner"
    )
    # longest-match-first: drop a match nested (word-bounded) inside a
    # longer match on the same row
    longer = matches.select(
        F.col("__row_id").alias("__rid2"), F.col("__country").alias("__longer")
    )
    survivors = (
        matches.join(
            longer,
            (F.col("__row_id") == F.col("__rid2"))
            & (F.length("__longer") > F.length("__country"))
            & F.regexp_like(F.col("__longer"), F.col("__pattern")),
            "left_anti",
        )
        .groupBy("__row_id")
        .agg(F.array_join(F.sort_array(F.collect_set("__country")), ",").alias("__canon"))
    )
    cleaned_original = F.trim(
        F.regexp_replace(F.lower(F.trim(F.col(noc_col))), r"\s+", " ")
    )
    return (
        work.join(survivors, on="__row_id", how="left")
        .withColumn(
            noc_col,
            F.when(F.col(noc_col).isNull(), F.lit(""))
            .when(F.col("__canon").isNotNull(), F.col("__canon"))
            .otherwise(cleaned_original),
        )
        .drop("__row_id", "__noc_norm", "__canon")
    )
