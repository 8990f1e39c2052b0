"""Binary-column operators.

Conventions for media at 100 TB:

- payload: one ``binary`` column (Parquet BYTE_ARRAY — column-pruned
  away unless the query touches it; never decode in a filter);
- metadata: a typed struct column (``MEDIA_META_SCHEMA``) written AT
  INGEST so planning-time predicates (resolution, duration, codec) prune
  without touching bytes;
- compute: ``mapInPandas`` — Arrow moves each batch to Python once; the
  UDF sees a pandas iterator, so per-batch vectorization applies and
  memory stays bounded by the batch size, not the partition;
- partitioning: payload rows are large — size
  ``spark.sql.files.maxPartitionBytes`` so a partition holds O(100)
  payloads, and NEVER groupBy a payload column (shuffle would move the
  bytes; aggregate metadata/features instead).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata carried beside every binary payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video|text
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("n_space_bytes", LongType()),
        StructField("byte_checksum", LongType()),
    ]
)


def attach_text_payload(documents: DataFrame) -> DataFrame:
    """Deterministic binary payload for the testdata ``documents`` table:
    the UTF-8 bytes of ``text`` plus text metadata. In production this
    column is the raw object bytes read at ingest."""
    return documents.withColumn("payload", F.encode("text", "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text").alias("media_type"),
            F.lit("utf-8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def extract_byte_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Per-payload byte statistics via ``mapInPandas``: length, space
    count, additive checksum (mod 2^31-1). The Arrow batch carries only
    (id, payload) — project before calling so no other columns cross the
    JVM↔Python boundary."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "n_space_bytes": payloads.map(
                        lambda b: b.count(b" ")
                    ).astype("int64"),
                    "byte_checksum": payloads.map(
                        lambda b: sum(b) % 2147483647
                    ).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(compute, _FEATURES_SCHEMA)


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: pseudo
    (width, height, mean_byte) derived from the bytes. Used by tests to
    exercise the decode plumbing without codec libraries."""
    n = len(payload)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    mean = (sum(payload) // n) if n else 0
    return w, h, mean


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode — STUB: codec libraries (PIL/opencv) are not in
    this container. The call signature and the mapInPandas plumbing
    around it are real; swap the body for ``PIL.Image.open`` in an
    environment that has it."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, absent in this container; "
            "use fake_decode_meta for plumbing tests"
        ) from exc
    raise NotImplementedError("wire PIL here when available")


def sample_frame_indices(
    df: DataFrame, n_frames_col: str = "media_meta.n_frames", every: int = 10
) -> DataFrame:
    """Video frame sampling as metadata arithmetic (no decode): one row
    per sampled frame index via ``posexplode(sequence(...))``. The
    payload column is deliberately NOT selected — at scale the sampled
    decode happens in a later mapInPandas over (payload, frame_idx)."""
    return (
        df.withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col(n_frames_col).cast("int") - 1, F.lit(0)),
                    F.lit(every),
                )
            ),
        )
        .drop("payload")
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("energy", LongType()),
    ]
)


def extract_frame_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 256,
) -> DataFrame:
    """Audio-shaped windowed feature extraction: split each payload into
    fixed-size byte frames and emit per-frame energy (Σ byte²) — the
    plumbing shape of resample/RMS/spectrogram stages (1 input row → N
    frame rows through an Arrow batch). A real pipeline swaps the energy
    lambda for a codec decode + DSP; the partitioning, batch shape, and
    explode semantics are exactly this."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, flen, energy = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for k in range(0, max(len(payload), 1), frame_size):
                    frame = payload[k : k + frame_size]
                    ids.append(int(doc_id))
                    fidx.append(k // frame_size)
                    flen.append(len(frame))
                    energy.append(int(sum(b * b for b in frame)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "frame_len": pd.Series(flen, dtype="int64"),
                    "energy": pd.Series(energy, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(compute, _FRAME_SCHEMA)


def plan_resize_dims(
    df: DataFrame,
    w_col: str,
    h_col: str,
    max_w: int,
    max_h: int,
) -> DataFrame:
    """Aspect-preserving downscale-only fit into a (max_w × max_h) box as
    PURE integer metadata arithmetic — no decode, no Python, exact on
    every engine. Adds ``dst_w``/``dst_h``/``needs_resize``. The binding
    side is chosen by cross-multiplication (w·max_h vs h·max_w) so no
    floats enter the plan; the actual pixel work happens later in a
    mapInPandas over only the rows where ``needs_resize``."""
    w, h = F.col(w_col), F.col(h_col)
    needs = (w > max_w) | (h > max_h)
    wide = (w * max_h) >= (h * max_w)
    dst_w = (
        F.when(~needs, w)
        .when(wide, F.lit(max_w))
        .otherwise(F.greatest(F.lit(1), F.expr(f"({w_col} * {max_h}) DIV {h_col}")))
    )
    dst_h = (
        F.when(~needs, h)
        .when(wide, F.greatest(F.lit(1), F.expr(f"({h_col} * {max_w}) DIV {w_col}")))
        .otherwise(F.lit(max_h))
    )
    return df.withColumn("dst_w", dst_w.cast("int")).withColumn(
        "dst_h", dst_h.cast("int")
    ).withColumn("needs_resize", needs)


def fake_resize_payload(payload: bytes, src_len: int, dst_len: int) -> bytes:
    """Deterministic stand-in for pixel resampling: stride-sample the
    payload down to ``dst_len`` bytes (nearest-index pick — the 1-D
    analogue of nearest-neighbor resize). Exercises the plumbing without
    codec libraries."""
    if dst_len >= src_len or src_len == 0:
        return payload
    return bytes(payload[(i * src_len) // dst_len] for i in range(dst_len))


def resize_image(payload: bytes, dst_w: int, dst_h: int):  # pragma: no cover
    """Real image resize — STUB: codec libraries are not in this
    container. Signature + the mapInPandas plumbing are real; swap the
    body for PIL's ``Image.open(...).resize((dst_w, dst_h))`` where
    available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires PIL/opencv, absent in this container; "
            "use fake_resize_payload for plumbing tests"
        ) from exc
    raise NotImplementedError("wire PIL here when available")
