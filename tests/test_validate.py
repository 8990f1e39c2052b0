"""validate.engine — planted-violation fixtures per FIXTURES.md §5."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.validate import Rule, RuleSet, reference_rules, unique_rule

D = datetime.date


@pytest.fixture(scope="module")
def planted(spark):
    cols = ["Name", "Sex", "Height_cm", "Weight_kg", "Born_Date", "Died_Date",
            "Born_Country"]
    rows = [
        ("Good Athlete", "Male", 180.0, 80.0, D(1950, 1, 1), None, "GER"),
        ("Bad Sex", "Other", 170.0, 70.0, D(1960, 1, 1), None, "USA"),
        ("Tall", "Male", 300.0, 80.0, D(1970, 1, 1), None, "FRA"),      # height
        ("Heavy BMI", "Female", 150.0, 150.0, D(1980, 1, 1), None, "ITA"),  # weight ok=150<=200? yes; BMI=66.7 fails
        ("Time Traveler", "Male", 180.0, 80.0, D(1990, 1, 1), D(1985, 1, 1), "ESP"),
        ("Long Country", "Male", 180.0, 80.0, D(1950, 2, 2), None, "Germany"),
        ("Dup Pair", "Male", 180.0, 80.0, D(1955, 5, 5), None, "SWE"),
        ("Dup Pair", "Female", 160.0, 60.0, D(1955, 5, 5), None, "NOR"),
        ("Null Heights", "Male", None, None, None, None, None),  # nulls pass
    ]
    return spark.createDataFrame(rows, cols)


def test_summary_counts(spark, planted):
    summary = {r["rule"]: r for r in reference_rules().summary(planted).collect()}
    assert all(r["n_checked"] == 9 for r in summary.values())
    assert summary["sex_valid"]["n_failed"] == 1
    assert summary["height_range"]["n_failed"] == 1
    assert summary["weight_range"]["n_failed"] == 0
    # 'Tall' (BMI 8.9) and 'Heavy BMI' (66.7) both out of [15,45]
    assert summary["bmi_range"]["n_failed"] == 2
    assert summary["country_3char"]["n_failed"] == 1
    assert summary["died_after_born"]["n_failed"] == 1
    assert summary["unique_name_born"]["n_failed"] == 2  # both dup rows flagged


def test_failures_table_shape(spark, planted):
    fails = reference_rules().failures(planted, context_cols=["Name"]).collect()
    by_rule: dict[str, list] = {}
    for r in fails:
        by_rule.setdefault(r["failed_check"], []).append(r)
    assert {r["Name"] for r in by_rule["sex_valid"]} == {"Bad Sex"}
    assert {r["Name"] for r in by_rule["unique_name_born"]} == {"Dup Pair"}
    scope_vals = {tuple(sorted(r["scope_values"].items())) for r in by_rule["bmi_range"]}
    assert (("Height_cm", "150.0"), ("Weight_kg", "150.0")) in scope_vals
    # null inputs never fail range rules (Pandera nullable default)
    assert "Null Heights" not in {r["Name"] for r in fails}


def test_null_fails_required_rule(spark):
    df = spark.createDataFrame([(1,), (None,)], ["id"])
    rs = RuleSet([Rule("id_required", lambda d: F.col("id").isNotNull(),
                       ("id",), null_fails=True)])
    s = rs.summary(df).collect()[0]
    assert (s["n_checked"], s["n_failed"]) == (2, 1)


def test_duplicate_rule_names_rejected():
    r = unique_rule("u", ["a"])
    with pytest.raises(ValueError):
        RuleSet([r, r])


def test_results_rules(spark):
    from olympic_athletes_etl_spark.validate import results_rules

    df = spark.createDataFrame(
        [
            (1, "Gold", 1),       # ok
            (2, "Silver", 1),     # mismatch
            (3, None, 9),         # null medal passes both
            (4, "Tin", 1),        # invalid medal value (+ mismatch)
            (5, "Gold", None),    # medal with null position → mismatch
            (None, None, 5),      # missing FK
        ],
        "Athlete_Id int, Medal string, Position int",
    )
    s = {r["rule"]: r["n_failed"] for r in results_rules().summary(df).collect()}
    assert s["medal_valid"] == 1          # Tin; NULL medal passes (nullable)
    assert s["medal_position_match"] == 3  # Silver@1, Tin@1, Gold@None
    assert s["athlete_id_required"] == 1


def test_editions_rules(spark):
    import datetime

    from olympic_athletes_etl_spark.validate import editions_rules

    D = datetime.date
    rows = [
        (1896, "Summer", "Olympic Games", D(1896, 4, 6), D(1896, 4, 15),
         D(1896, 4, 6), D(1896, 4, 13)),
        (1896, "Summer", "Olympic Games", None, None, None, None),  # dup key
        (776, "Summer", "Ancient Games", D(1900, 1, 2), D(1900, 1, 1),
         D(1900, 1, 2), D(1900, 1, 1)),  # year + type + both date orders
        (2000, None, "Olympic Games", None, D(2000, 9, 1), None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "Year int, Edition_Name string, Game_Type string, Opened_Date date, "
        "Closed_Date date, Competition_Start date, Competition_End date",
    )
    s = {r["rule"]: r["n_failed"] for r in editions_rules().summary(df).collect()}
    assert s["year_range"] == 1
    assert s["game_type_valid"] == 1
    assert s["edition_name_valid"] == 0   # NULL edition passes (nullable)
    assert s["unique_game_edition"] == 2  # both 1896 rows flagged
    assert s["opened_before_closed"] == 1  # NULL-tolerant
    assert s["competition_start_before_end"] == 1


def test_benford_digits_partition_and_share_identities(spark, sf_dir):
    from olympic_athletes_etl_spark.plans.tables import load
    from olympic_athletes_etl_spark.plans.validate_q import v_benford_digits

    rows = {r["digit"]: r for r in v_benford_digits(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    total = (
        load(spark, sf_dir, "orders")
        .filter("o_totalprice >= 1")
        .count()
    )
    assert sum(r["n_orders"] for r in rows.values()) == total
    for r in rows.values():
        assert r["share_x10000"] == (10000 * r["n_orders"]) // total
    # shares sum to ~100% (floor division loses < 9 units)
    s = sum(r["share_x10000"] for r in rows.values())
    assert 10000 - 9 <= s <= 10000
