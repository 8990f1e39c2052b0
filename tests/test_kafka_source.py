"""Kafka-shaped source: the wire adapter must emit the exact Kafka source
schema, and the decode → watermark → window pipeline over a wire stream
must equal its batch twin (no broker in the container — the rate adapter
and a parquet-backed wire stream stand in; to_kafka_wire is the same
projection either way).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from olympic_athletes_etl_spark.streaming import (
    KAFKA_WIRE_SCHEMA,
    decode_kafka_events,
    kafka_shaped_rate_source,
    run_available_now,
    to_kafka_wire,
    tumbling_counts,
)


def _rate_shaped_batch(spark, n: int):
    """Batch frame with the rate source's (timestamp, value) schema."""
    return spark.range(n).select(
        (
            F.lit("2024-01-01 10:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") * 60)
        ).alias("timestamp"),
        F.col("id").alias("value"),
    )


def _names_types(schema):
    # lit()-derived columns are non-nullable; Kafka's are nullable — the
    # wire CONTRACT is names + types (nullability only narrows).
    return [(f.name, f.dataType) for f in schema.fields]


def test_rate_adapter_is_streaming_with_kafka_wire_schema(spark):
    wire = kafka_shaped_rate_source(spark, rows_per_batch=10)
    assert wire.isStreaming
    assert _names_types(wire.schema) == _names_types(KAFKA_WIRE_SCHEMA)


def test_wire_roundtrip_decodes_payload(spark):
    wire = to_kafka_wire(_rate_shaped_batch(spark, 6), topic="t")
    assert _names_types(wire.schema) == _names_types(KAFKA_WIRE_SCHEMA)
    rows = {r["event_id"]: r for r in decode_kafka_events(wire).collect()}
    assert set(rows) == set(range(6))
    assert rows[0]["event_type"] == "view"
    assert rows[1]["event_type"] == "click"
    assert rows[4]["user_id"] == 4
    assert rows[2]["ts"].minute == 2
    # partition/offset metadata present and deterministic on the wire
    meta = {r["offset"]: r["partition"] for r in wire.collect()}
    assert meta[5] == 1  # 5 % 4


def test_kafka_stream_window_counts_match_batch_twin(spark, tmp_path):
    """End-to-end: kafka-wire parquet stream → decode → watermarked
    tumbling window == the identical batch pipeline over the same wire."""
    wire_batch = to_kafka_wire(_rate_shaped_batch(spark, 180))
    d = str(tmp_path / "wire")
    os.makedirs(d)
    wire_batch.coalesce(2).write.mode("overwrite").parquet(d)

    wire_stream = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(d)
    streamed = tumbling_counts(decode_kafka_events(wire_stream))
    run_available_now(streamed, "kafka_tumbling", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.table("kafka_tumbling").collect()
    }

    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in tumbling_counts(
            decode_kafka_events(spark.read.parquet(d))
        ).collect()
    }
    assert got == expected
    assert len(expected) == 9  # 3 hourly windows × 3 event types


def test_decode_nulls_malformed_payloads(spark):
    """A corrupt value payload must null out per-column (from_json
    semantics), not fail the batch — the rows route to the error
    side-channel via the F5/F9 operators downstream."""
    from pyspark.sql import functions as F

    wire = to_kafka_wire(_rate_shaped_batch(spark, 3))
    corrupt = wire.withColumn(
        "value",
        F.when(F.col("offset") == 1, F.lit(b"not json")).otherwise(
            F.col("value")
        ),
    )
    decoded = decode_kafka_events(corrupt).collect()
    assert len(decoded) == 3
    bad = [r for r in decoded if r["event_id"] is None]
    good = [r for r in decoded if r["event_id"] is not None]
    assert len(bad) == 1 and len(good) == 2
