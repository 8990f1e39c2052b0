"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) —
the modern engine-integrated form of the reference's hand-rolled source
stage (SURVEY.md §2.1 S4/S8: the scraper built RDDs of Rows + explicit
schema; a DataSource instead gives Catalyst a real scan node with
partition planning).

``synthetic_events`` generates a deterministic event stream from pure
integer arithmetic (no RNG — same rows on every executor, every run):

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 1000).option("n_partitions", 8).load())

Scale notes: ``partitions()`` is the planning contract — each partition
generates its own row range independently (no driver materialization,
no shuffle); the source parallelizes to exactly ``n_partitions`` tasks.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_EPOCH = datetime.datetime(2024, 1, 1)

SCHEMA_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE"
)


def _row(i: int):
    """Deterministic event i — integer mixing only."""
    h = (i * 2654435761) % 2**31
    return (
        i,
        _EPOCH + datetime.timedelta(seconds=i * 7 + h % 5),
        h % 100,
        _EVENT_TYPES[h % len(_EVENT_TYPES)],
        round((h % 10_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — deterministic generated events."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)
