"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Kernels dispatch on library availability, preferring full-fidelity
decoders and degrading honestly: image dims via PIL -> stdlib
PNG/GIF header parse -> deterministic fake; audio via soundfile ->
stdlib ``wave`` -> fake; resize via PIL -> explicit
``NotImplementedError`` at execution. Everything Spark-side is real
and tested either way: schema, Arrow batch shape, ``mapInPandas``
partition flow, and the deterministic fake used by the SQL oracle
(test payloads are text bytes, which no real decoder accepts, so the
oracle contract is availability-independent).

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


try:  # kernel probe: prefer the full-fidelity library when present
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False

try:
    import soundfile as _soundfile  # type: ignore

    _HAS_SOUNDFILE = True
except ImportError:
    _soundfile = None
    _HAS_SOUNDFILE = False


def _decode_image(payload: bytes) -> dict:
    """Image decode kernel, three tiers by availability:

    1. PIL when importable (any format PIL reads);
    2. pure-stdlib header parse for PNG (IHDR) and GIF (logical
       screen descriptor) — real dimensions, no dependencies;
    3. deterministic fake derived from the byte length (the test /
       no-media-lib fallback, clearly a stand-in).
    """
    if _HAS_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return {"width": im.width, "height": im.height}
        except Exception:
            pass  # undecodable payload -> fall through to the fake
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        import struct

        w, h = struct.unpack(">II", payload[16:24])
        return {"width": w, "height": h}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        import struct

        w, h = struct.unpack("<HH", payload[6:10])
        return {"width": w, "height": h}
    n = len(payload)
    return {"width": 64 + n % 512, "height": 64 + (n * 7) % 512}


def _decode_audio(payload: bytes) -> dict:
    """Audio decode kernel: soundfile when importable, stdlib ``wave``
    for RIFF/WAV payloads, else the deterministic fake.
    width = frame count, height = channel count."""
    if _HAS_SOUNDFILE:
        import io

        try:
            with _soundfile.SoundFile(io.BytesIO(payload)) as sf:
                return {"width": sf.frames, "height": sf.channels}
        except Exception:
            pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as wf:
                return {"width": wf.getnframes(), "height": wf.getnchannels()}
        except Exception:
            pass
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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize through the same mapInPandas seam as the other
    kernels: when PIL is importable each payload is decoded, resized
    (bilinear) and re-encoded as PNG; without a pixel-capable library
    the kernel raises ``NotImplementedError`` AT EXECUTION TIME, by
    design — the Spark-side plumbing (schema, Arrow batch flow,
    lazy plan construction) is identical either way, so a
    library-present environment runs real resizes with zero code
    change here."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _HAS_PIL:
            raise NotImplementedError(
                "image resize kernel needs a pixel decoder (PIL/libvips) "
                "which is not available in this environment"
            )
        import io

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                with _PILImage.open(io.BytesIO(bytes(p))) as im:
                    buf = io.BytesIO()
                    im.resize((width, height)).save(buf, format="PNG")
                    out.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


# historical name for the no-library behavior; same seam
resize_stub = resize_images


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
