"""CLI entry point (__main__): list/run/oracle wiring + the pipeline
subcommand end-to-end over parquet inputs."""

from __future__ import annotations

import datetime

import pytest

from olympic_athletes_etl_spark.__main__ import main

D = datetime.date


def test_cli_list_filters_and_reports(spark, capsys):
    assert main(["list", "--prefix", "g_"]) == 0
    out = capsys.readouterr().out
    assert "g_pagerank\toracle" in out
    assert all(line.startswith("g_") for line in out.strip().splitlines())


def test_cli_run_executes_query(spark, sf_dir, capsys):
    assert main(["run", "a_value_counts", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "event_type" in out


def test_cli_run_unknown_query_suggests(spark, capsys):
    assert main(["run", "a_value_count"]) == 2
    assert "did you mean" in capsys.readouterr().err


def test_cli_oracle_prints_sql_and_flags_rows_only(spark, capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out
    # u_noc_canonicalize gained a hash oracle in round 6 — the registry
    # is 231/231 gated, so the rows-only exit path only fires for
    # genuinely unregistered oracles now.
    assert main(["oracle", "u_noc_canonicalize"]) == 0
    assert "noc_canon" in capsys.readouterr().out


def test_cli_run_out_writes_parquet(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "extract")
    assert main(
        ["run", "a_value_counts", "--sf-dir", sf_dir, "--out", dest]
    ) == 0
    assert spark.read.parquet(dest).count() > 0


def test_cli_pipeline_runs_on_parquet_inputs(spark, tmp_path, capsys):
    bio_cols = [
        "Roles", "Sex", "Full name", "Used name", "Born", "Died",
        "Measurements", "Nick/petnames", "Title(s)", "Other names",
        "Original name", "Name order", "Nationality", "Affiliations",
        "NOC", "Athlete_Id",
    ]

    def bio(**kw):
        base = dict.fromkeys(bio_cols)
        base.update(kw)
        return tuple(base[c] for c in bio_cols)

    bio_schema = ", ".join(
        f"`{c}` {'int' if c == 'Athlete_Id' else 'string'}" for c in bio_cols
    )
    raw_bio = spark.createDataFrame(
        [
            bio(Athlete_Id=1, Sex="Male", **{"Used name": "A•B"},
                Born="1 January 1970", Measurements="180 cm / 80 kg",
                NOC="France"),
        ],
        bio_schema,
    )
    res_cols = ["Games", "Event", "Team", "Pos", "Medal", "As", "NOC",
                "Discipline", "Nationality", "Athlete_Id"]
    res_schema = ", ".join(
        f"`{c}` {'int' if c == 'Athlete_Id' else 'string'}" for c in res_cols
    )
    raw_res = spark.createDataFrame(
        [("1968 Summer Olympics", "100m", None, "1", "Gold", "A", "FRA",
          "Athletics", None, 1)],
        res_schema,
    )
    ed_cols = ["#", "Year", "City", "Country", "Opened", "Closed",
               "Competition", "Unnamed: 7", "Game_Type", "Edition_Name"]
    ed_schema = ", ".join(
        f"`{c}` {'int' if c == 'Year' else 'string'}" for c in ed_cols
    )
    raw_ed = spark.createDataFrame(
        [("I", 1968, "Mexico City", "MEX", "12 October", "27 October",
          "13 – 26 October", None, "Olympic Games", "Summer")],
        ed_schema,
    )
    iso = spark.createDataFrame(
        [("France", "FRA")],
        ["English short name lower case", "Alpha-3 code"],
    )
    paths = {}
    for name, df in (
        ("bios", raw_bio), ("results", raw_res),
        ("editions", raw_ed), ("iso", iso),
    ):
        p = str(tmp_path / name)
        df.write.parquet(p)
        paths[name] = p
    rc = main(
        [
            "pipeline",
            "--bios", paths["bios"],
            "--results", paths["results"],
            "--editions", paths["editions"],
            "--iso", paths["iso"],
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "gold.dim_athletes: 1 rows" in err
    assert "validation failure cases:" in err
