"""Kafka-shaped streaming source (SURVEY §2.10 extension).

The production path is Spark's built-in Kafka source (``format("kafka")``),
which emits the fixed wire schema below. The connector jar
(spark-sql-kafka-0-10) is not in this container, so the ingestion is split
in two so everything downstream of the wire is fully testable offline:

- ``read_kafka_stream``  — the real connector plumbing (options, starting
  offsets, subscribe pattern). Fails at ``start()`` with Spark's
  data-source-not-found error when the jar is absent; nothing else in the
  module depends on it.
- ``to_kafka_wire`` / ``kafka_shaped_rate_source`` — deterministic
  adapters that produce the IDENTICAL wire schema from the built-in rate
  source (or any batch DataFrame), so the decode + watermark + window
  pipeline is exercised end-to-end in tests without a broker.
- ``decode_kafka_events`` — wire → typed ``EVENT_SCHEMA`` rows
  (JSON-in-value, the reference pipelines' encoding); feeds the same
  watermarked operators as the file source.

At scale: one Spark input partition per Kafka topic-partition; the decode
is a stateless narrow map (from_json, JVM-side); watermarks come from the
EVENT time extracted from the payload, never from broker arrival time —
so repartitioning/backfill never reorders correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from olympic_athletes_etl_spark.streaming.pipeline import EVENT_SCHEMA

# The exact output schema of Spark's Kafka source (spark-sql-kafka-0-10).
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_N_FAKE_PARTITIONS = 4
_EVENT_TYPES = ("view", "click", "purchase")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Real Kafka source plumbing. ``maxOffsetsPerTrigger`` is the Kafka
    analogue of ``maxFilesPerTrigger`` — bounded micro-batches during
    backlog replay. Requires the spark-sql-kafka-0-10 package on the
    classpath (absent in this container; the adapter below produces the
    same wire schema for tests)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def to_kafka_wire(rate_df: DataFrame, topic: str = "events") -> DataFrame:
    """Map a rate-shaped frame (``timestamp`` timestamp, ``value`` long —
    the built-in rate/rate-micro-batch schema) onto the Kafka wire schema,
    with a deterministic JSON event payload in ``value``. Works on batch
    and streaming frames alike (stateless projection), which is what lets
    the tests oracle the streaming path with a batch twin."""
    v = F.col("value")
    payload = F.to_json(
        F.struct(
            v.alias("event_id"),
            F.col("timestamp").alias("ts"),
            (v % 50).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in _EVENT_TYPES]),
                (v % len(_EVENT_TYPES) + 1).cast("int"),
            ).alias("event_type"),
            F.round(((v * 7919) % 1000) / 10.0, 1).alias("value"),
        )
    )
    return rate_df.select(
        v.cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        (v % _N_FAKE_PARTITIONS).cast("int").alias("partition"),
        v.alias("offset"),
        F.col("timestamp").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),  # 0 = CreateTime
    )


def kafka_shaped_rate_source(
    spark: SparkSession,
    rows_per_second: int = 100,
    rows_per_batch: int | None = None,
) -> DataFrame:
    """Kafka-wire stream without a broker: the built-in rate source
    (``rows_per_batch`` switches to rate-micro-batch for deterministic
    batch sizes) mapped through ``to_kafka_wire``."""
    if rows_per_batch is not None:
        rate = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", str(rows_per_batch))
            .load()
        )
    else:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second))
            .load()
        )
    return to_kafka_wire(rate)


def decode_kafka_events(wire: DataFrame) -> DataFrame:
    """Wire → typed event rows: parse the JSON payload against
    EVENT_SCHEMA (malformed payloads null out per-column — route them via
    a not-null filter, the streaming twin of the F5/F9 batch operators).
    Event time comes from the PAYLOAD ``ts``; broker metadata is dropped
    here and would be carried as lineage columns when auditing matters."""
    fields = [f.name for f in EVENT_SCHEMA.fields]
    parsed = wire.select(
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e")
    )
    return parsed.select(*[F.col(f"e.{n}").alias(n) for n in fields])
