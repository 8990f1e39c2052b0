"""Structured Streaming extension (SURVEY.md §2.10: the reference has no
streaming — this is the beyond-reference scale path; the batch twins of
these operators are oracle-checked as the ``e_*`` registry queries)."""

from olympic_athletes_etl_spark.streaming.kafka_source import (
    KAFKA_WIRE_SCHEMA,
    decode_kafka_events,
    kafka_shaped_rate_source,
    read_kafka_stream,
    to_kafka_wire,
)
from olympic_athletes_etl_spark.streaming.pipeline import (
    EVENT_SCHEMA,
    enrich_with_static_dim,
    read_event_stream,
    run_available_now,
    running_user_stats,
    session_counts,
    sessionize_with_state,
    sliding_counts,
    tumbling_counts,
    view_click_attribution,
)

__all__ = [
    "EVENT_SCHEMA",
    "KAFKA_WIRE_SCHEMA",
    "decode_kafka_events",
    "enrich_with_static_dim",
    "kafka_shaped_rate_source",
    "read_event_stream",
    "read_kafka_stream",
    "run_available_now",
    "running_user_stats",
    "session_counts",
    "sessionize_with_state",
    "sliding_counts",
    "to_kafka_wire",
    "tumbling_counts",
    "view_click_attribution",
]
