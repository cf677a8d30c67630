"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/frame-sample kernels are STUBS (the image/audio
libraries are not in this container — see the clearly marked seams
below); everything Spark-side is real and tested: schema, Arrow batch
shape, ``mapInPandas`` partition flow, and the deterministic fake
feature extractor used by tests and the SQL oracle.

At scale: binary payloads ride in the same Parquet row group as their
metadata; ``mapInPandas`` streams Arrow batches so a partition never
materializes all payloads at once; per-batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("fake_width", IntegerType(), False),
        StructField("fake_height", IntegerType(), False),
    ]
)


def attach_fake_media(corpus: DataFrame) -> DataFrame:
    """Deterministic binary column synthesized from the text (UTF-8
    bytes) — a stand-in for real image/audio payloads, so the binary
    plumbing is exercised end-to-end with no external data."""
    return corpus.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _decode_image(payload: bytes) -> dict:
    """STUB — real implementation would be e.g. PIL.Image.open.
    Deterministic fake: dimensions derived from the byte length."""
    n = len(payload)
    return {"width": 64 + n % 512, "height": 64 + (n * 7) % 512}


def _decode_audio(payload: bytes) -> dict:
    """STUB — real implementation would be e.g. soundfile.read."""
    n = len(payload)
    return {"width": n % 48000, "height": 1}


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: streams Arrow batches through
    the (stubbed) decode kernels. The batch shape, schema, and
    partitioning are production-real; only the kernel is fake."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            decoded = [
                _decode_image(p) if mt == "image" else _decode_audio(p)
                for p, mt in zip(payloads, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": pd.Series([d["width"] for d in decoded], dtype="int32"),
                    "fake_height": pd.Series([d["height"] for d in decoded], dtype="int32"),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: real kernels unavailable in this container.
    Raises at execution time, by design, with the production seam
    documented: replace ``_resize_kernel`` with the real library."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize kernel not available in this environment; "
            "plug PIL/libvips into _resize_kernel here"
        )

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, *, every_n_bytes: int = 64) -> DataFrame:
    """Video frame sampling plumbing: one input row -> many frame rows
    via mapInPandas (the production shape for ffmpeg-style samplers).
    The sampler kernel is a deterministic fake — each "frame" is a
    fixed-stride byte slice of the payload — so the one-to-many Arrow
    batch flow, schema, and ordering are exercised end-to-end with no
    media libraries; swap ``_slice_frames`` for a real decoder (e.g.
    pyav) in production."""

    def _slice_frames(payload: bytes) -> list[bytes]:
        return [
            payload[o: o + every_n_bytes]
            for o in range(0, len(payload), every_n_bytes)
        ]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(_slice_frames(bytes(payload))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)
