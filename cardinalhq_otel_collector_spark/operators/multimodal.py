"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
layout, Arrow-batched UDF signatures, frame-sampling row explosion. The
actual codec work (JPEG decode, resampling, frame extraction) is STUBBED:
the image/audio libraries are not in this container, so ``_decode_stub``
produces a deterministic fake feature vector from the bytes; a real
deployment swaps ONE function (the pandas batch fn) without touching the
pipeline. Every UDF here is Arrow-batched via mapInPandas — never
row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_features",
    "sample_frames",
]

# fact-table layout for media: opaque payload + typed metadata columns
# (promoted, not a map — Iceberg/parquet stats and pruning work on them)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),        # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_FEATURE_DIM = 8

_DECODE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        # doubles, not float32: the stub features feed cosine math and
        # oracle comparisons — float32 truncation costs precision for no
        # storage win at this column's cardinality
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)

_FRAME_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without a codec: byte size + magic-byte
    sniffing (pure JVM expressions — stays out of Python entirely)."""
    magic = F.hex(F.substring(F.col(payload_col), 1, 4))
    sniffed = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("n_bytes", F.length(payload_col)).withColumn("sniffed_mime", sniffed)


def _fake_features(payload: bytes | None, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded feature vector.

    STUB: a real deployment replaces this with e.g. PIL/torchvision decode
    + model features. Kept deterministic (md5 of the bytes) so pipeline
    tests have stable goldens.
    """
    import hashlib

    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, feature rows out.

    The batch shape is the contract: each pandas chunk holds many rows, the
    per-row codec call happens inside one Python invocation per batch —
    this is the only sanctioned Python island (input_hint allows
    vectorized pandas/Arrow UDFs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    # vectorized length (NaN for NULL payloads → 0); the
                    # .map below is the CODEC BOUNDARY — one decoder call
                    # per item is inherent to a codec, the batching win is
                    # Arrow transfer + one Python invocation per batch
                    "n_bytes": pdf["payload"].str.len().fillna(0).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return df.mapInPandas(batches, schema=_DECODE_OUT_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: explode each media row into frame rows at a
    fixed cadence. Frame *timing* is pure JVM (sequence+explode); frame
    *extraction* is the stubbed Python island.

    STUB: frame_payload is a deterministic slice of the source bytes — a
    real deployment decodes the container instead. Raises ValueError for
    non-video rows (caller filters), mirroring the reference marshaler's
    signal-type errors (body_marshaler.go:46-52)."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", (F.col("frame_idx").cast("long") * every_ms))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # vectorized over the Arrow batch: numpy offset arithmetic, one
            # list comprehension over pre-computed slices — no per-row
            # pandas.apply (row-at-a-time inside a batch defeats Arrow)
            lens = pdf["payload"].str.len().fillna(0).astype("int64").to_numpy()
            starts = pdf["frame_idx"].to_numpy() % np.maximum(lens, 1)
            payloads = pdf["payload"].to_numpy()
            frames_col = [
                None if b is None else bytes(b[s : s + 16])
                for b, s in zip(payloads, starts)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame_payload": frames_col,
                }
            )

    return frames.mapInPandas(batches, schema=_FRAME_OUT_SCHEMA)
