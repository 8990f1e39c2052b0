"""Stage-II imputation (SURVEY.md §2.3-2.5; reference:
pandas_based/src/data_clean_II.py + aws_migration/src/data_clean_II_glue.py).

Three imputations, each a lazy DataFrame transform:

- primary discipline: mode of ``Discipline`` per athlete from results,
  value-ascending tie-break (A2 — pandas ``mode().iloc[0]`` semantics;
  data_clean_II.py:20-24; the Glue twin data_clean_II_glue.py:57-66 is
  nondeterministic on ties, SURVEY §7 pins the pandas behavior).
- height/weight: exact median by (Sex, Discipline), falling back to
  median by Sex, with ``*_Imputed`` flags (data_clean_II.py:31-55;
  exact — never percentile_approx, data_clean_II_glue.py:80-90 diverges).
- Born_Country from NOC: first comma-separated NOC name, lowercased,
  joined against the ISO lookup (J3 join form per
  data_clean_II_glue.py:104-117 — the pandas twin's dict-.apply
  data_clean_II.py:73-93 is the slow path we deliberately avoid).

Scale: the discipline mode shuffles on Athlete_Id only at (athlete ×
discipline) cardinality; the median windows shuffle on (Sex, Discipline)
— low-cardinality ⇒ AQE coalesces; the ISO join broadcasts (~250 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.operators.relational import (
    grouped_median_impute,
    mode_per_group,
)


def impute_primary_discipline(bios: DataFrame, results: DataFrame) -> DataFrame:
    """Attach each athlete's most frequent results ``Discipline`` (left
    join — athletes with no results keep NULL)."""
    primary = mode_per_group(
        results.filter(F.col("Discipline").isNotNull()), "Athlete_Id", "Discipline"
    ).select("Athlete_Id", "Discipline")
    return bios.join(primary, on="Athlete_Id", how="left")


def impute_measurements(
    bios_with_discipline: DataFrame,
    height_col: str = "Height_cm",
    weight_col: str = "Weight_kg",
    sex_col: str = "Sex",
    discipline_col: str = "Discipline",
    drop_discipline: bool = True,
) -> DataFrame:
    """Median-impute height and weight by (Sex, Discipline) → (Sex), with
    ``Height_Imputed``/``Weight_Imputed`` flags (True only where a value
    was actually filled — matching the reference's flag update at
    data_clean_II.py:48-55)."""
    out = grouped_median_impute(
        bios_with_discipline,
        height_col,
        [sex_col, discipline_col],
        fallback_cols=[sex_col],
        flag_col="Height_Imputed",
    )
    out = grouped_median_impute(
        out,
        weight_col,
        [sex_col, discipline_col],
        fallback_cols=[sex_col],
        flag_col="Weight_Imputed",
    )
    return out.drop(discipline_col) if drop_discipline else out


def impute_born_country(bios: DataFrame, iso: DataFrame) -> DataFrame:
    """Fill NULL ``Born_Country`` with the Alpha-3 code of the first
    NOC country name; ``Born_Country_From_NOC`` flags rows that were
    null before (reference flags the null-mask regardless of whether the
    lookup succeeded — data_clean_II.py:95-103 — preserved here)."""
    lookup = F.broadcast(
        iso.select(
            F.lower(F.trim(F.col("English short name lower case"))).alias("__iso_name"),
            F.col("Alpha-3 code").alias("__alpha3"),
        ).dropDuplicates(["__iso_name"])
    )
    first_noc = F.lower(F.trim(F.split(F.col("NOC"), ",").getItem(0)))
    joined = (
        bios.withColumn("Born_Country_From_NOC", F.col("Born_Country").isNull())
        .withColumn(
            "__noc_key",
            F.when(F.col("Born_Country").isNull(), F.nullif(first_noc, F.lit(""))),
        )
        .join(lookup, F.col("__noc_key") == F.col("__iso_name"), "left")
    )
    return (
        joined.withColumn(
            "Born_Country", F.coalesce(F.col("Born_Country"), F.col("__alpha3"))
        )
        .drop("__noc_key", "__iso_name", "__alpha3")
    )


def impute_edition_dates(editions: DataFrame) -> DataFrame:
    """Fill missing Opened/Closed dates from the competition range, with
    flags (data_clean_II.py:107-132; Glue twin data_clean_II_glue.py:137-155)."""
    opened_fill = F.col("Opened_Date").isNull() & F.col("Competition_Start").isNotNull()
    closed_fill = F.col("Closed_Date").isNull() & F.col("Competition_End").isNotNull()
    return (
        editions.withColumn("Opened_Imputed", opened_fill)
        .withColumn("Closed_Imputed", closed_fill)
        .withColumn(
            "Opened_Date", F.coalesce(F.col("Opened_Date"), F.col("Competition_Start"))
        )
        .withColumn(
            "Closed_Date", F.coalesce(F.col("Closed_Date"), F.col("Competition_End"))
        )
    )
