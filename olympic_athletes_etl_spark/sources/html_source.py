"""HTML-table source — the reference's scraping stage re-expressed as a
pluggable Spark source (SURVEY.md §2.1 S4/S10, §2.9 R3/R4; reference:
pandas_based/src/athlete_scrape.py:98-158 parse, :250-290 threaded
driver; aws_migration/src/athlete_scrape_glue.py:64-212 mapPartitions).

Shape: an id table fans out over partitions; each partition runs one
fetch callable per id (the reference holds one HTTP session per
partition — same lifecycle here via ``fetch_factory``), parses the
page's tables, and emits TAGGED rows (``bio`` / ``result`` / ``error``)
that ``split_by_tag`` routes to three typed DataFrames.

Parsing is stdlib-only (``html.parser``) — no bs4/lxml dependency. The
fetch callable is injected, so tests run on fixture HTML and production
swaps in an HTTP client; politeness delays/retries live inside the
injected fetcher, not the engine.

Scale: I/O-bound fan-out — partition count = concurrency (reference
pins NUM_PARTITIONS=16); rows cross to the JVM through one Arrow batch
per partition via ``mapInPandas``. Resume = ``resume_remaining`` (F8
left_anti against the checkpoint glob), so a re-run fetches only
missing ids.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: one tagged row per parsed record; payload is a JSON object so the
#: Arrow schema stays fixed regardless of page shape
TAGGED_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("tag", StringType(), False),
        StructField("payload", StringType(), False),
    ]
)

#: results-table columns that arrive on section-header rows and
#: forward-fill into the event rows below them (R4;
#: athlete_scrape.py:142-158)
HEADER_CARRY_COLS = ("NOC", "Discipline", "As", "Games")


class _TableParser(HTMLParser):
    """Collect every <table> as a list of rows, each row a list of cell
    texts (colspan-expanded)."""

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._span = 1

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.tables.append([])
        elif tag == "tr" and self.tables:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []
            self._span = int(dict(attrs).get("colspan", 1) or 1)

    def handle_endtag(self, tag):
        if tag == "tr" and self._row is not None:
            if self._row:
                self.tables[-1].append(self._row)
            self._row = None
        elif tag in ("td", "th") and self._cell is not None:
            text = " ".join("".join(self._cell).split())
            self._row.extend([text] * self._span)
            self._cell = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def parse_tables(html: str) -> list[list[list[str]]]:
    p = _TableParser()
    p.feed(html)
    return p.tables


def parse_kv_table(rows: list[list[str]]) -> dict[str, str]:
    """2-column attribute table → one wide record (R3 transpose; the
    reference transposes with ``df.T``, athlete_scrape.py:113-116 — here
    the pivot happens during parse, no engine-level transpose needed)."""
    return {r[0]: r[1] for r in rows if len(r) >= 2 and r[0]}


def parse_results_table(rows: list[list[str]]) -> list[dict[str, str]]:
    """Results table with embedded section-header rows: a header row
    carries (Games, Discipline, NOC, As) for the event rows after it —
    copy down (R4 unpivot + ffill), drop the headers. Here the ffill is
    per-page sequential state; the engine-level equivalent over already-
    flattened rows is ``operators.relational.forward_fill`` (W5)."""
    if not rows:
        return []
    header = rows[0]
    carry: dict[str, str] = {}
    out: list[dict[str, str]] = []
    for r in rows[1:]:
        rec = {header[i]: r[i] for i in range(min(len(header), len(r)))}
        is_section = bool(rec.get("Games")) and not rec.get("Event")
        if is_section:
            carry = {c: rec[c] for c in HEADER_CARRY_COLS if rec.get(c)}
            continue
        for c, v in carry.items():
            rec.setdefault(c, v)
            if not rec[c]:
                rec[c] = v
        out.append(rec)
    return out


def scrape_source(
    ids: DataFrame,
    fetch_factory: Callable[[], Callable[[str], str]],
    id_col: str = "entity_id",
    num_partitions: int = 16,
) -> DataFrame:
    """Distributed scrape: repartition ids to the concurrency level, one
    fetcher per partition (the reference's one-HTTP-session-per-partition,
    athlete_scrape_glue.py:157-212), parse, emit tagged rows. Fetch or
    parse failure becomes an ``error`` row — the S10 side-channel, never
    a task failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetch_factory()  # one per partition, like one HTTP session
        for pdf in batches:
            rows = []
            for eid in pdf[id_col].astype(str):
                try:
                    tables = parse_tables(fetch(eid))
                    bio = parse_kv_table(tables[0]) if tables else {}
                    results = (
                        parse_results_table(tables[1]) if len(tables) > 1 else []
                    )
                    rows.append((eid, "bio", json.dumps(bio, sort_keys=True)))
                    rows.extend(
                        (eid, "result", json.dumps(r, sort_keys=True))
                        for r in results
                    )
                except Exception as exc:  # noqa: BLE001 — S10 error routing
                    rows.append((eid, "error", json.dumps({"error": str(exc)})))
            yield pd.DataFrame(rows, columns=["entity_id", "tag", "payload"])

    return (
        ids.select(F.col(id_col).cast("string").alias(id_col))
        .repartition(num_partitions)
        .mapInPandas(run, TAGGED_SCHEMA)
    )


def tagged_to_tables(
    tagged: DataFrame, payload_fields: dict[str, list[str]]
) -> dict[str, DataFrame]:
    """Route tagged rows to typed tables: per tag, lift the declared JSON
    fields to columns (explicit schema at the boundary — engine rule §4).
    Pair with ``tagged.persist()`` when the scrape is expensive so the
    fan-out computes once."""
    out: dict[str, DataFrame] = {}
    for tag, fields in payload_fields.items():
        schema = StructType([StructField(f, StringType()) for f in fields])
        out[tag] = (
            tagged.filter(F.col("tag") == tag)
            .select(
                "entity_id",
                F.from_json("payload", schema).alias("p"),
            )
            .select("entity_id", *[F.col(f"p.`{f}`").alias(f) for f in fields])
        )
    return out


def incremental_scrape_run(
    spark,
    all_ids: DataFrame,
    fetch_factory: Callable[[], Callable[[str], str]],
    checkpoint_dir: str,
    consolidated_dir: str,
    id_col: str = "entity_id",
    num_partitions: int = 16,
    batch_limit: int | None = None,
) -> DataFrame:
    """One crash-safe increment of the scraping lifecycle (reference:
    athlete_scrape_glue.py:278-362 — resume-diff → scrape → append
    checkpoint → consolidate):

    1. left_anti-diff ``all_ids`` against everything already
       checkpointed (distributed — the reference collects the done-set
       to the driver);
    2. scrape the remaining ids (optionally capped at ``batch_limit`` —
       the reference's ``checkpoint_every`` batching);
    3. append the tagged rows to the checkpoint dir (S6: each run adds
       files, never rewrites);
    4. glob-read ALL checkpoints and overwrite the consolidated table.

    Returns the consolidated tagged DataFrame. Re-running after a crash
    fetches only missing ids — the driver-visible contract is
    exactly-once per id."""
    from olympic_athletes_etl_spark.sources.io import (
        read_parquet_glob,
        resume_remaining,
    )

    remaining = resume_remaining(
        spark, all_ids.select(id_col), checkpoint_dir, id_col
    )
    if batch_limit is not None:
        remaining = remaining.orderBy(id_col).limit(batch_limit)
    if remaining.isEmpty():
        return read_parquet_glob(spark, checkpoint_dir)
    tagged = scrape_source(
        remaining, fetch_factory, id_col=id_col, num_partitions=num_partitions
    )
    tagged.write.mode("append").parquet(checkpoint_dir)
    consolidated = read_parquet_glob(spark, checkpoint_dir)
    consolidated.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        consolidated_dir
    )
    return consolidated
