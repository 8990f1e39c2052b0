"""etl.impute + etl.noc + etl.publish — stage-II semantics
(reference: data_clean_II.py, data_clean.py:172-256, columns_renaming_*)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.etl.impute import (
    impute_born_country,
    impute_edition_dates,
    impute_measurements,
    impute_primary_discipline,
)
from olympic_athletes_etl_spark.etl.noc import canonicalize_noc_df, canonicalize_noc_udf
from olympic_athletes_etl_spark.etl.publish import GOLD_MAPPINGS, apply_gold_mapping

D = datetime.date


@pytest.fixture(scope="module")
def iso(spark):
    return spark.createDataFrame(
        [
            ("Germany", "DEU"),
            ("South Korea", "KOR"),
            ("United States", "USA"),
            ("France", "FRA"),
            ("Russian Federation", "RUS"),
            ("United Kingdom", "GBR"),
            ("Guinea", "GIN"),
            ("Equatorial Guinea", "GNQ"),
        ],
        ["English short name lower case", "Alpha-3 code"],
    )


def test_impute_pipeline(spark):
    bios = spark.createDataFrame(
        [(1, "M", None, 80.0), (2, "M", 180.0, None), (3, "M", 190.0, 90.0),
         (4, "F", None, None)],
        "Athlete_Id int, Sex string, Height_cm double, Weight_kg double",
    )
    results = spark.createDataFrame(
        [(1, "Swim"), (1, "Swim"), (1, "Run"),
         (2, "Swim"), (3, "Swim"), (4, "Judo")],
        ["Athlete_Id", "Discipline"],
    )
    out = {
        r["Athlete_Id"]: r
        for r in impute_measurements(
            impute_primary_discipline(bios, results)
        ).collect()
    }
    # (M, Swim) heights: {180, 190} → median 185 imputed for athlete 1
    assert (out[1]["Height_cm"], out[1]["Height_Imputed"]) == (185.0, True)
    # athlete 2 weight: (M, Swim) weights {80, 90} → 85
    assert (out[2]["Weight_kg"], out[2]["Weight_Imputed"]) == (85.0, True)
    assert (out[3]["Height_Imputed"], out[3]["Weight_Imputed"]) == (False, False)
    # athlete 4: (F, Judo) all-null → F-only fallback also all-null → stays null
    assert out[4]["Height_cm"] is None
    assert "Discipline" not in out[1].asDict()


def test_impute_born_country(spark, iso):
    bios = spark.createDataFrame(
        [(1, None, "West Germany, France"), (2, "KOR", "South Korea"),
         (3, None, "Atlantis"), (4, None, None)],
        "Athlete_Id int, Born_Country string, NOC string",
    )
    out = {r["Athlete_Id"]: r for r in impute_born_country(bios, iso).collect()}
    # 'west germany' is NOT an ISO name (legacy rewrite is U1's job, not here)
    assert out[1]["Born_Country"] is None and out[1]["Born_Country_From_NOC"] is True
    assert out[2]["Born_Country"] == "KOR" and out[2]["Born_Country_From_NOC"] is False
    assert out[3]["Born_Country"] is None  # unknown name stays null, flag True
    assert out[4]["Born_Country"] is None
    # a resolvable first-NOC fills in
    bios2 = spark.createDataFrame(
        [(9, None, "France, Poland")], "Athlete_Id int, Born_Country string, NOC string"
    )
    assert impute_born_country(bios2, iso).collect()[0]["Born_Country"] == "FRA"


def test_impute_edition_dates(spark):
    eds = spark.createDataFrame(
        [(1, None, D(1896, 4, 15), D(1896, 4, 6), D(1896, 4, 13)),
         (2, D(1900, 5, 1), None, D(1900, 5, 14), None)],
        "Game_Id int, Opened_Date date, Closed_Date date, "
        "Competition_Start date, Competition_End date",
    )
    out = {r["Game_Id"]: r for r in impute_edition_dates(eds).collect()}
    assert out[1]["Opened_Date"] == D(1896, 4, 6)
    assert out[1]["Opened_Imputed"] is True and out[1]["Closed_Imputed"] is False
    assert out[2]["Closed_Date"] is None and out[2]["Closed_Imputed"] is False


NOC_CASES = [
    ("West Germany", "germany"),
    ("Republic of Korea", "south korea"),
    ("France, Poland", "france"),  # poland not in fixture ISO list
    ("ROC", "russian federation"),
    ("Great Britain and France", "france,united kingdom"),
    ("Equatorial Guinea", "equatorial guinea"),  # longest-first: not 'guinea'
    ("Atlantis", "atlantis"),  # no match → cleaned original
    (None, ""),
]


def _noc_input(spark):
    return spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(NOC_CASES)], "id int, NOC string"
    )


def test_canonicalize_noc_udf(spark, iso):
    names = [r[0] for r in iso.select("English short name lower case").collect()]
    out = _noc_input(spark).withColumn("NOC", canonicalize_noc_udf(names)(F.col("NOC")))
    got = {r["id"]: r["NOC"] for r in out.collect()}
    assert got == {i: want for i, (_, want) in enumerate(NOC_CASES)}


def test_canonicalize_noc_df_matches_udf(spark, iso):
    out = canonicalize_noc_df(_noc_input(spark), iso)
    got = {r["id"]: r["NOC"] for r in out.collect()}
    assert got == {i: want for i, (_, want) in enumerate(NOC_CASES)}


def test_apply_gold_mapping(spark):
    df = spark.createDataFrame(
        [(1, "A", 180.0, "extra")],
        "Athlete_Id int, Name string, Height_cm double, Unmapped string",
    )
    out = apply_gold_mapping(df, GOLD_MAPPINGS["dim_athletes"])
    # only mapped columns survive, in mapping order
    assert out.columns == ["athlete_id", "athlete_name", "athlete_height_cm"]
