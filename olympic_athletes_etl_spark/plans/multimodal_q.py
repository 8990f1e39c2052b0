"""Multimodal plumbing on the correctness surface: the Arrow-batched
``mapInPandas`` byte-feature extractor, oracled by DuckDB computing the
same statistics from the text the payload was derived from (documents
are ASCII, so byte semantics == char semantics on the oracle side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from olympic_athletes_etl_spark.multimodal import (
    attach_text_payload,
    extract_byte_features,
)
from olympic_athletes_etl_spark.plans.registry import query
from olympic_athletes_etl_spark.plans.tables import load


@query(
    "m_byte_features",
    oracle="""
    SELECT doc_id,
           strlen(text)::BIGINT AS byte_len,
           (strlen(text) - strlen(replace(text, ' ', '')))::BIGINT AS n_space_bytes,
           (list_sum(list_transform(range(1, strlen(text) + 1),
                                    i -> ascii(text[i]))) % 2147483647)::BIGINT
             AS byte_checksum
    FROM documents
    """,
)
def m_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → (byte_len, n_space_bytes, byte_checksum) through
    the real mapInPandas path (JVM → Arrow batch → pandas → Arrow → JVM).
    This is the template for decode/feature-extract at scale: project to
    (id, payload) first so only needed bytes cross the boundary."""
    docs = attach_text_payload(load(spark, sf_dir, "documents"))
    return extract_byte_features(docs)
