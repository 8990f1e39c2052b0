"""Bronze → Gold end-to-end: the reference DAG on FIXTURES.md-shaped raw
tables, checked down to gold schemas, imputed values, and captured
validation failures."""

from __future__ import annotations

import datetime

import pytest

from olympic_athletes_etl_spark.etl.pipeline import run_pipeline
from olympic_athletes_etl_spark.etl.publish import GOLD_MAPPINGS

D = datetime.date

BIO_COLS = [
    "Roles", "Sex", "Full name", "Used name", "Born", "Died", "Measurements",
    "Nick/petnames", "Title(s)", "Other names", "Original name", "Name order",
    "Nationality", "Affiliations", "NOC", "Athlete_Id",
]
RES_COLS = ["Games", "Event", "Team", "Pos", "Medal", "As", "NOC",
            "Discipline", "Nationality", "Athlete_Id"]
ED_COLS = ["#", "Year", "City", "Country", "Opened", "Closed", "Competition",
           "Unnamed: 7", "Game_Type", "Edition_Name"]


def _bio(**kw):
    base = dict.fromkeys(BIO_COLS)
    base.update(kw)
    return tuple(base[c] for c in BIO_COLS)


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    bio_schema = ", ".join(
        f"`{c}` {'int' if c == 'Athlete_Id' else 'string'}" for c in BIO_COLS
    )
    raw_bio = spark.createDataFrame(
        [
            _bio(Athlete_Id=1, Sex="Male",
                 **{"Used name": "Arthur•Heyne"},
                 Born="25 August 1946 in Kaiserslautern, Rheinland-Pfalz (GER)",
                 Measurements="181 cm / 79 kg",
                 Affiliations="SC Berlin, Berlin (GER)",
                 NOC="West Germany"),
            _bio(Athlete_Id=2, Sex="Male",
                 **{"Used name": "Needs•Impute"},
                 Born="1950",
                 NOC="France"),
            _bio(Athlete_Id=3, Sex="Male",
                 **{"Used name": "Arthur•Heyne"},  # dup (Name, Born_Date=null)? distinct Born
                 Born="1 January 2001",
                 Measurements="300 cm / 80 kg",   # height violation
                 NOC="France"),
        ],
        bio_schema,
    )
    res_schema = ", ".join(
        f"`{c}` {'int' if c == 'Athlete_Id' else 'string'}" for c in RES_COLS
    )
    raw_res = spark.createDataFrame(
        [
            ("1968 Summer Olympics", "High Jump", None, "=12", None, "A", "FRG",
             "Athletics", None, 1),
            ("1972 Summer Olympics", "High Jump", None, "4", None, "A", "FRG",
             "Athletics", None, 1),
            ("1968 Summer Olympics", "100m", None, "1", "Gold", "B", "FRA",
             "Athletics", None, 2),
        ],
        res_schema,
    )
    ed_schema = ", ".join(
        f"`{c}` {'int' if c == 'Year' else 'string'}" for c in ED_COLS
    )
    raw_ed = spark.createDataFrame(
        [
            ("I", 1968, "Mexico City", "MEX", "12 October", "27 October",
             "13 – 26 October", None, "Olympic Games", "Summer"),
            ("II", 1972, "Munich", "FRG", None, None, "26 August – 10 September",
             None, "Olympic Games", "Summer"),
            (None, 776, "Olympia", "GRE", None, None, None, None,
             "Ancient Olympic Games", ""),
        ],
        ed_schema,
    )
    iso = spark.createDataFrame(
        [("Germany", "DEU"), ("France", "FRA")],
        ["English short name lower case", "Alpha-3 code"],
    )
    gold_dir = str(tmp_path_factory.mktemp("gold"))
    return run_pipeline(raw_bio, raw_res, raw_ed, iso, gold_dir=gold_dir), gold_dir


def test_gold_schemas(result):
    res, _ = result
    for name, df in res.gold.items():
        assert df.columns == list(GOLD_MAPPINGS[name].values()), name


def test_gold_values(spark, result):
    res, _ = result
    athletes = {r["athlete_id"]: r for r in res.gold["dim_athletes"].collect()}
    a1 = athletes[1]
    assert a1["athlete_name"] == "Arthur Heyne"
    assert a1["athlete_born_date"] == D(1946, 8, 25)
    assert a1["athlete_height_cm"] == 181.0
    assert a1["athlete_is_height_imputed"] is False
    # athlete 2: no measurements → imputed from the (Male, Athletics)
    # median; athlete 3 has no results (null discipline) so only athlete
    # 1's 181 is in the group
    a2 = athletes[2]
    assert a2["athlete_is_height_imputed"] is True
    assert a2["athlete_height_cm"] == 181.0
    # Born_Country from first NOC ('France' → FRA); bare-year Born parsed
    assert a2["athlete_born_country"] == "FRA"
    assert a2["athlete_is_born_country_from_NOC"] is True
    assert a2["athlete_born_date"] == D(1950, 1, 1)

    games = {r["dim_game_year"]: r for r in res.gold["dim_games"].collect()}
    assert set(games) == {1968, 1972}  # Ancient filtered
    assert games[1972]["dim_opened"] == D(1972, 8, 26)   # imputed from comp start
    assert games[1972]["dim_opened_imputed"] is True
    assert games[1968]["dim_opened_imputed"] is False

    facts = res.gold["fct_results"].collect()
    assert {(r["athlete_id"], r["m_position"], r["m_tied_flag"]) for r in facts} == {
        (1, 12, True), (1, 4, False), (2, 1, False)
    }

    affs = res.gold["dim_affiliations"].collect()
    assert [(r["dim_affiliation_club"], r["dim_affiliation_country"]) for r in affs] == [
        ("SC Berlin", "GER")
    ]
    bridge = res.gold["bridge_athletes_affiliations"].collect()
    assert [(r["athlete_id"], r["affiliation_id"]) for r in bridge] == [(1, 0)]


def test_validation_captured_not_fatal(result):
    res, _ = result
    summary = {r["rule"]: r["n_failed"] for r in res.validation_summary.collect()}
    assert summary["height_range"] == 1     # athlete 3's 300cm
    assert summary["bmi_range"] >= 1
    fails = res.failure_cases.collect()
    assert {r["Athlete_Id"] for r in fails} == {3}
    # the violating row still reached gold (lazy validation)
    assert res.gold["dim_athletes"].count() == 3


def test_gold_written_to_disk(spark, result):
    _, gold_dir = result
    back = spark.read.parquet(f"{gold_dir}/dim_athletes.parquet")
    assert back.count() == 3
    assert back.columns == list(GOLD_MAPPINGS["dim_athletes"].values())
