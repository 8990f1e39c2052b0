"""sources.html_source — the scraping stage on fixture HTML (no network).

Fixture pages mirror the reference's page shape: a 2-column biodata
attribute table (R3 transpose) + a results table with section-header
rows that forward-fill NOC/Discipline/Games into event rows (R4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.sources.html_source import (
    parse_kv_table,
    parse_results_table,
    parse_tables,
    scrape_source,
    tagged_to_tables,
)

PAGE = """
<html><body>
<table>
  <tr><td>Used name</td><td>Arthur&bull;Heyne</td></tr>
  <tr><td>Born</td><td>25 August 1946 in Kaiserslautern, Rheinland-Pfalz (GER)</td></tr>
  <tr><td>Measurements</td><td>181 cm / 79 kg</td></tr>
</table>
<table>
  <tr><th>Games</th><th>Discipline</th><th>NOC</th><th>As</th><th>Event</th><th>Pos</th></tr>
  <tr><td>1968 Summer Olympics</td><td>Athletics</td><td>FRG</td><td>Arthur Heyne</td><td></td><td></td></tr>
  <tr><td></td><td></td><td></td><td></td><td>High Jump, Men</td><td>=12</td></tr>
  <tr><td></td><td></td><td></td><td></td><td>Long Jump, Men</td><td>7</td></tr>
  <tr><td>1972 Summer Olympics</td><td>Athletics</td><td>FRG</td><td>Arthur Heyne</td><td></td><td></td></tr>
  <tr><td></td><td></td><td></td><td></td><td>High Jump, Men</td><td>4</td></tr>
</table>
</body></html>
"""

BROKEN_PAGE = "<html><body>no tables here"


def test_parse_tables_and_kv():
    tables = parse_tables(PAGE)
    assert len(tables) == 2
    kv = parse_kv_table(tables[0])
    assert kv["Used name"] == "Arthur•Heyne"
    assert kv["Measurements"] == "181 cm / 79 kg"


def test_parse_results_header_ffill():
    rows = parse_results_table(parse_tables(PAGE)[1])
    assert len(rows) == 3  # section headers dropped
    assert rows[0]["Event"] == "High Jump, Men"
    assert rows[0]["Games"] == "1968 Summer Olympics"
    assert rows[0]["NOC"] == "FRG"
    assert rows[1]["Pos"] == "7"
    # second section re-fills with the new header values
    assert rows[2]["Games"] == "1972 Summer Olympics"
    assert rows[2]["Pos"] == "4"


def _fetch_factory():
    calls = {"n": 0}

    def fetch(eid: str) -> str:
        if eid == "3":
            raise OSError("boom 404")
        return PAGE if eid != "4" else BROKEN_PAGE

    return fetch


def test_scrape_source_end_to_end(spark):
    ids = spark.createDataFrame([("1",), ("2",), ("3",), ("4",)], ["entity_id"])
    tagged = scrape_source(ids, _fetch_factory, num_partitions=2).persist()
    by_tag = {
        r["tag"]: r["n"]
        for r in tagged.groupBy("tag").agg(F.count("*").alias("n")).collect()
    }
    # ids 1,2 → 1 bio + 3 results each; id 3 → error row; id 4 → empty
    # page parses to an empty bio (no tables ⇒ no results, not an error)
    assert by_tag == {"bio": 3, "result": 6, "error": 1}

    tables = tagged_to_tables(
        tagged,
        {
            "bio": ["Used name", "Born", "Measurements"],
            "result": ["Games", "Discipline", "NOC", "Event", "Pos"],
            "error": ["error"],
        },
    )
    bios = {r["entity_id"]: r for r in tables["bio"].collect()}
    assert bios["1"]["Used name"] == "Arthur•Heyne"
    assert bios["4"]["Used name"] is None  # empty page → null fields
    res = tables["result"].filter(F.col("entity_id") == "2").collect()
    assert {r["Pos"] for r in res} == {"=12", "7", "4"}
    err = tables["error"].collect()[0]
    assert err["entity_id"] == "3" and "boom" in err["error"]
    tagged.unpersist()


def test_incremental_scrape_run_resumes(spark, tmp_path):
    from olympic_athletes_etl_spark.sources.html_source import (
        incremental_scrape_run,
    )

    ckpt = str(tmp_path / "ckpt")
    cons = str(tmp_path / "consolidated")
    ids = spark.createDataFrame([(str(i),) for i in range(1, 7)], ["entity_id"])

    # first run capped at 3 ids → only 1,2,3 scraped
    out1 = incremental_scrape_run(
        spark, ids, _fetch_factory, ckpt, cons, num_partitions=2, batch_limit=3
    )
    assert {r["entity_id"] for r in out1.select("entity_id").distinct().collect()} \
        == {"1", "2", "3"}

    # second run picks up ONLY the remaining ids (4,5,6 — incl. the error id)
    out2 = incremental_scrape_run(
        spark, ids, _fetch_factory, ckpt, cons, num_partitions=2
    )
    seen = {r["entity_id"] for r in out2.select("entity_id").distinct().collect()}
    assert seen == {"1", "2", "3", "4", "5", "6"}
    # consolidated table on disk matches
    assert {r["entity_id"] for r in
            spark.read.parquet(cons).select("entity_id").distinct().collect()} == seen

    # third run: nothing remaining → checkpoint contents returned unchanged
    out3 = incremental_scrape_run(spark, ids, _fetch_factory, ckpt, cons)
    assert out3.count() == out2.count()
