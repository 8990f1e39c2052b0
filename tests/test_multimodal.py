"""multimodal.columns — binary payload plumbing over mapInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olympic_athletes_etl_spark.multimodal import (
    MEDIA_META_SCHEMA,
    attach_text_payload,
    decode_image,
    extract_byte_features,
    fake_decode_meta,
    sample_frame_indices,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "ab cd"), (1, "xyz"), (2, "")], ["doc_id", "text"]
    )


def test_attach_and_extract_byte_features(spark, docs):
    out = {r["doc_id"]: r for r in extract_byte_features(attach_text_payload(docs)).collect()}
    assert (out[0]["byte_len"], out[0]["n_space_bytes"]) == (5, 1)
    assert out[0]["byte_checksum"] == (97 + 98 + 32 + 99 + 100)
    assert (out[1]["byte_len"], out[1]["n_space_bytes"]) == (3, 0)
    assert (out[2]["byte_len"], out[2]["byte_checksum"]) == (0, 0)


def test_media_meta_struct(spark, docs):
    row = attach_text_payload(docs).select("media_meta").first()["media_meta"]
    assert row["media_type"] == "text" and row["codec"] == "utf-8"
    assert set(row.asDict()) == {f.name for f in MEDIA_META_SCHEMA.fields}


def test_fake_decode_deterministic():
    w1, h1, m1 = fake_decode_meta(b"hello world")
    w2, h2, m2 = fake_decode_meta(b"hello world")
    assert (w1, h1, m1) == (w2, h2, m2)
    assert fake_decode_meta(b"") == (16, 16, 0)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_sample_frame_indices(spark):
    df = spark.createDataFrame([(1, 25)], ["vid_id", "n"]).select(
        "vid_id",
        F.lit(b"fake").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.col("n").cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )
    out = sample_frame_indices(df, every=10)
    assert [r["frame_idx"] for r in out.collect()] == [0, 10, 20]
    assert "payload" not in out.columns
