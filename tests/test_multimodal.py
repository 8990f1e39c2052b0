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


def test_plan_resize_dims_integer_fit(spark):
    from olympic_athletes_etl_spark.multimodal.columns import plan_resize_dims

    df = spark.createDataFrame(
        [(1, 16, 16), (2, 64, 16), (3, 16, 64), (4, 64, 48), (5, 1000, 1)],
        "id long, w int, h int",
    )
    rows = {
        r["id"]: (r["dst_w"], r["dst_h"], r["needs_resize"])
        for r in plan_resize_dims(df, "w", "h", 32, 32).collect()
    }
    assert rows[1] == (16, 16, False)     # already fits: untouched
    assert rows[2] == (32, 8, True)       # wide: width binds
    assert rows[3] == (8, 32, True)       # tall: height binds
    assert rows[4] == (32, 24, True)      # 4:3 preserved exactly
    assert rows[5] == (32, 1, True)       # degenerate: floor clamps to 1
    # aspect never inverted: dst fits the box for every row
    assert all(dw <= 32 and dh <= 32 for dw, dh, _ in rows.values())


def test_fake_resize_payload_stride_sampling():
    from olympic_athletes_etl_spark.multimodal.columns import fake_resize_payload

    src = bytes(range(100))
    out = fake_resize_payload(src, len(src), 10)
    assert len(out) == 10
    assert out == bytes((i * 100) // 10 for i in range(10))
    assert fake_resize_payload(src, len(src), 200) == src  # never upscales


def test_resize_image_stub_raises_without_pil():
    import pytest

    from olympic_athletes_etl_spark.multimodal.columns import resize_image

    with pytest.raises(NotImplementedError):
        resize_image(b"xx", 8, 8)
