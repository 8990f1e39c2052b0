"""Multimodal column support (beyond-reference extension): opaque
``binary`` payloads + typed metadata, processed via Arrow-batched
``mapInPandas`` — the Spark-side plumbing is real and tested; actual
image/audio decoding is stubbed (codec libs absent in this container)."""

from olympic_athletes_etl_spark.multimodal.columns import (
    MEDIA_META_SCHEMA,
    attach_text_payload,
    decode_image,
    extract_byte_features,
    fake_decode_meta,
    sample_frame_indices,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_text_payload",
    "decode_image",
    "extract_byte_features",
    "fake_decode_meta",
    "sample_frame_indices",
]
