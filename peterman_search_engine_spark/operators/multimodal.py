"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Kernels dispatch on library availability, preferring full-fidelity
decoders and degrading honestly: image dims via PIL -> stdlib
PNG/GIF header parse -> deterministic fake; audio via soundfile ->
stdlib ``wave`` -> fake. Pixel/sample-level kernels no longer need
any external library: ``resize_images`` uses PIL when importable and
otherwise a pure numpy/zlib PNG codec (``png_decode``/``png_encode``,
all five scanline filters) with vectorized bilinear resampling, and
``audio_sample_stats`` reads real WAV sample frames through stdlib
``wave`` + numpy. Everything Spark-side is real and tested either
way: schema, Arrow batch shape, ``mapInPandas`` partition flow, and
the deterministic fake used by the SQL oracle (test payloads are text
bytes, which no real decoder accepts, so the oracle contract is
availability-independent).

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


# -- pure-Python pixel/sample codecs (no PIL / soundfile needed) ------------
#
# PNG here means the baseline everyone writes: 8-bit depth, greyscale /
# RGB / RGBA, non-interlaced — the subset PIL's default PNG writer and
# this module's own encoder emit. Implemented directly from the public
# PNG spec (RFC 2083): zlib-inflated IDAT, per-scanline filter byte,
# filters 0-4 (None/Sub/Up/Average/Paeth).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def png_decode(payload: bytes):
    """payload -> ``uint8`` ndarray of shape (height, width, channels).
    Raises ``ValueError`` for anything that is not a baseline
    (8-bit, non-interlaced, grey/RGB/RGBA) PNG."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace or comp or filt:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype} "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    rl = stride + 1
    for y in range(h):
        ft = raw[y * rl]
        line = np.frombuffer(raw, np.uint8, stride, y * rl + 1).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub — per-channel-lane prefix sum, vectorized
            cur = (line.reshape(-1, ch).cumsum(axis=0) & 0xFF).reshape(-1)
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # Average (sequential left-dependency)
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth (sequential left-dependency)
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def png_encode(arr) -> bytes:
    """(h, w[, channels]) uint8 array -> baseline PNG bytes (filter 0
    scanlines, one zlib stream) — grey (1ch), RGB (3) or RGBA (4)."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    body = np.zeros((h, w * ch + 1), dtype=np.uint8)
    body[:, 1:] = a.reshape(h, -1)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body.tobytes()))
        + chunk(b"IEND", b"")
    )


def resize_bilinear(arr, width: int, height: int):
    """Vectorized bilinear resample of an (h, w, c) uint8 array to
    (height, width, c) — samples at pixel centers, edge-clamped (the
    standard convention, same alignment PIL uses)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w = a.shape[:2]
    x = (np.arange(width) + 0.5) * (w / width) - 0.5
    y = (np.arange(height) + 0.5) * (h / height) - 0.5
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(x - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(y - y0, 0.0, 1.0)[:, None, None]
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def wav_samples(payload: bytes):
    """RIFF/WAV payload -> int sample ndarray of shape
    (frames, channels) via stdlib ``wave`` (8/16/32-bit PCM).
    Raises ``ValueError`` for non-WAV payloads."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAV payload")
    with wave.open(io.BytesIO(payload)) as wf:
        n, ch, sw = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        data = wf.readframes(n)
    if sw == 1:
        a = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif sw == 2:
        a = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif sw == 4:
        a = np.frombuffer(data, dtype="<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return a.reshape(-1, ch)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("peak", LongType(), False),
        StructField("rms_e6", LongType(), False),
    ]
)


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """Sample-level WAV analysis through the mapInPandas seam — real
    PCM frames (not header fields): peak |amplitude| and RMS (scaled
    1e6, integer — exact cross-engine comparisons). No audio library
    needed; soundfile, when importable, would slot into the same
    kernel for non-WAV formats."""
    import math

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = wav_samples(bytes(payload))
                sq = float((s.astype("float64") ** 2).mean()) if s.size else 0.0
                rows.append(
                    (
                        int(doc_id),
                        int(s.shape[0]),
                        int(s.shape[1]),
                        int(abs(s).max()) if s.size else 0,
                        int(round(math.sqrt(sq) * 1_000_000)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_channels", "peak", "rms_e6"],
            )

    return media.mapInPandas(_stats, AUDIO_STATS_SCHEMA)


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
    kernels: each payload is decoded, bilinear-resampled and
    re-encoded as PNG. When PIL is importable it handles any format
    it reads; otherwise the pure numpy/zlib PNG codec above does the
    pixel work — no library needed, no stub. Undecodable payloads
    raise ``ValueError`` at execution time (fail loud, not a silent
    fake — a resize that fabricates pixels would poison a training
    pipeline)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        def kernel(p: bytes) -> bytes:
            if _HAS_PIL:
                with _PILImage.open(io.BytesIO(p)) as im:
                    buf = io.BytesIO()
                    im.resize((width, height)).save(buf, format="PNG")
                    return buf.getvalue()
            return png_encode(resize_bilinear(png_decode(p), width, height))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": [kernel(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


# historical name from when this raised without PIL; same seam
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
