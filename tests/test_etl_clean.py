"""etl.clean — the reference pipeline's stage-I cleaning on FIXTURES.md
row shapes (raw_biodata / raw_results / raw_editions, verbatim columns).
"""

from __future__ import annotations

import datetime

import pytest

from olympic_athletes_etl_spark.etl.clean import (
    clean_biodata,
    clean_editions,
    clean_results,
    normalize_affiliations,
)

BIO_COLS = [
    "Roles", "Sex", "Full name", "Used name", "Born", "Died", "Measurements",
    "Nick/petnames", "Title(s)", "Other names", "Original name", "Name order",
    "Nationality", "Affiliations", "NOC", "Athlete_Id",
]


def _bio_row(**kw):
    base = dict.fromkeys(BIO_COLS)
    base.update(kw)
    return tuple(base[c] for c in BIO_COLS)


@pytest.fixture(scope="module")
def bios(spark):
    rows = [
        _bio_row(
            Athlete_Id=1,
            **{"Used name": "Arthur•Heyne", "Full name": "Arthur•Heyne"},
            Sex="Male",
            Born="25 August 1946 in Kaiserslautern, Rheinland-Pfalz (GER)",
            Died="1 January 2020",
            Measurements="181 cm / 79 kg",
            Roles="Competed in Olympic Games • Referee",
            Affiliations="Samsung Life Sports Club, Seoul (KOR)",
            NOC="West Germany",
        ),
        _bio_row(
            Athlete_Id=2,
            **{"Used name": "Kim•In-Sub"},
            Sex="Female",
            Born="1894",
            Measurements="69 kg",
            Affiliations="Club A / Club B, City (GER)",
        ),
        _bio_row(Athlete_Id=3, **{"Used name": "No•Data"},
                 Affiliations="Lone Club, (USA)"),
    ]
    schema = ", ".join(
        f"`{c}` {'int' if c == 'Athlete_Id' else 'string'}" for c in BIO_COLS
    )
    return spark.createDataFrame(rows, schema)


def test_clean_biodata(spark, bios):
    out = {r["Athlete_Id"]: r for r in clean_biodata(bios).collect()}
    r1 = out[1]
    assert r1["Name"] == "Arthur Heyne"
    assert r1["Born_Date"] == datetime.date(1946, 8, 25)
    assert r1["Died_Date"] == datetime.date(2020, 1, 1)
    assert (r1["Born_City"], r1["Born_Region"], r1["Born_Country"]) == (
        "Kaiserslautern", "Rheinland-Pfalz", "GER")
    assert (r1["Height_cm"], r1["Weight_kg"]) == (181.0, 79.0)
    assert r1["Is_Alive"] is False
    assert r1["Roles"] == "Competed in Olympic Games,Referee"
    r2 = out[2]
    assert r2["Born_Date"] == datetime.date(1894, 1, 1)  # bare-year fallback
    assert r2["Born_City"] is None
    assert (r2["Height_cm"], r2["Weight_kg"]) == (None, 69.0)
    assert r2["Is_Alive"] is True
    # noise columns dropped, raw parse sources dropped
    for gone in ("Nick/petnames", "Nationality", "Born", "Measurements"):
        assert gone not in clean_biodata(bios).columns


def test_normalize_affiliations(spark, bios):
    dim, bridge = normalize_affiliations(clean_biodata(bios))
    dims = {(r["Affiliation_Club"], r["Affiliation_City"], r["Affiliation_Country"])
            for r in dim.collect()}
    assert ("Samsung Life Sports Club", "Seoul", "KOR") in dims
    assert ("Club A", None, None) in dims
    assert ("Club B", "City", "GER") in dims
    # city-as-code fixup: 'Lone Club, (USA)' → country USA, city NULL
    assert ("Lone Club", None, "USA") in dims
    # ids contiguous from 0
    ids = sorted(r["Affiliation_Id"] for r in dim.collect())
    assert ids == list(range(len(ids)))
    assert bridge.count() == 4


def test_clean_results(spark):
    cols = ["Games", "Event", "Team", "Pos", "Medal", "As", "NOC",
            "Discipline", "Nationality", "Athlete_Id"]
    rows = [
        ("1988 Summer Olympics", "High Jump", None, "=41", None, "A", "USA",
         "Athletics", None, 1),
        ("2014 Winter Olympics", "Slalom", None, "2T", "Silver", "B", "FIN",
         "Skiing", None, 2),
        ("2000 Summer Olympics", "Judo", None, "16", None, "C", "KOR",
         "Judo", None, 3),
        ("1996 Summer Olympics", "Epee", None, "DNS", None, "D", "GER",
         "Fencing", None, 4),
        ("1996 Summer Olympics", "Epee", None, None, None, "E", "GER",
         "Fencing", None, 5),
    ]
    schema = ", ".join(
        f"`{c}` {'int' if c == 'Athlete_Id' else 'string'}" for c in cols
    )
    out = {r["Athlete_Id"]: r
           for r in clean_results(spark.createDataFrame(rows, schema)).collect()}
    assert (out[1]["Year"], out[1]["Games_Name"]) == (1988, "Summer Olympics")
    assert (out[1]["Position"], out[1]["Tied"]) == (41, True)
    assert (out[2]["Position"], out[2]["Tied"]) == (2, True)
    assert (out[3]["Position"], out[3]["Tied"]) == (16, False)
    assert (out[4]["Position"], out[4]["Tied"]) == (None, False)  # DNS
    assert (out[5]["Position"], out[5]["Tied"]) == (None, None)   # null Pos stays null
    assert "Nationality" not in out[1].asDict()


def test_clean_editions(spark):
    cols = ["#", "Year", "City", "Country", "Opened", "Closed", "Competition",
            "Unnamed: 7", "Game_Type", "Edition_Name"]
    rows = [
        ("I", 1896, "Athina", "GRE", "6 April", "15 April", "6 – 13 April",
         None, "Olympic Games", "Summer"),
        ("II", 1900, "Paris", "FRA", None, None, "14 May – 28 October",
         None, "Olympic Games", "Summer"),
        (None, 776, "Olympia", "GRE", None, None, None,
         None, "Ancient Olympic Games", ""),
        ("III", 1916, "Berlin", "GER", None, None, None,
         "Not held due to war", "Olympic Games", "Summer"),
    ]
    out = clean_editions(spark.createDataFrame(rows, cols))
    got = {r["Year"]: r for r in out.collect()}
    assert 776 not in got  # Ancient filtered
    r1896 = got[1896]
    assert r1896["Opened_Date"] == datetime.date(1896, 4, 6)
    assert r1896["Closed_Date"] == datetime.date(1896, 4, 15)
    # same-month shorthand: '6 – 13 April' → start borrows April
    assert r1896["Competition_Start"] == datetime.date(1896, 4, 6)
    assert r1896["Competition_End"] == datetime.date(1896, 4, 13)
    r1900 = got[1900]
    assert r1900["Competition_Start"] == datetime.date(1900, 5, 14)
    assert r1900["Competition_End"] == datetime.date(1900, 10, 28)
    assert got[1916]["Comments"] == "Not held due to war"
    # deterministic Game_Id 1..N in (Year, Game_Type, Edition_Name) order
    assert [r["Game_Id"] for r in out.orderBy("Year").collect()] == [1, 2, 3]
