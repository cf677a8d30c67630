"""Kernel dispatch in operators.multimodal.

The decode seam has three tiers (library -> stdlib header parse ->
deterministic fake). PIL/soundfile are absent in this container, so
the library tier is covered by self-skipping tests; the stdlib tier
is covered for REAL with synthesized PNG/GIF/WAV payloads (struct +
the stdlib ``wave`` writer — still no external data or packages)."""

import io
import struct
import wave

import pytest

from peterman_search_engine_spark.operators.multimodal import (
    _HAS_PIL,
    _HAS_SOUNDFILE,
    _decode_audio,
    _decode_image,
    attach_fake_media,
    extract_features,
    resize_images,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h)


def _wav(n_frames: int, channels: int, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x00" * n_frames * channels)
    return buf.getvalue()


def test_png_header_decode():
    assert _decode_image(_png(640, 480)) == {"width": 640, "height": 480}


def test_gif_header_decode():
    assert _decode_image(_gif(320, 200)) == {"width": 320, "height": 200}


def test_wav_decode_stdlib():
    assert _decode_audio(_wav(1234, 2)) == {"width": 1234, "height": 2}


def test_undecodable_payload_falls_back_to_fake():
    p = b"not an image at all"
    n = len(p)
    assert _decode_image(p) == {
        "width": 64 + n % 512, "height": 64 + (n * 7) % 512,
    }
    assert _decode_audio(p) == {"width": n % 48000, "height": 1}


def test_extract_features_real_payloads(spark):
    """The mapInPandas seam with real (stdlib-decodable) payloads."""
    rows = [
        (0, "image", bytearray(_png(99, 77))),
        (1, "audio", bytearray(_wav(500, 1))),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r.doc_id: r for r in extract_features(media).collect()}
    assert (out[0].fake_width, out[0].fake_height) == (99, 77)
    assert (out[1].fake_width, out[1].fake_height) == (500, 1)


def test_resize_raises_without_pixel_decoder(spark):
    if _HAS_PIL:
        pytest.skip("PIL present: covered by test_resize_with_pil")
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(Exception) as ei:
        resize_images(attach_fake_media(docs), 32, 32).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed")
def test_resize_with_pil(spark):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (64, 48)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(0, "image", bytearray(buf.getvalue()))],
        "doc_id long, media_type string, payload binary",
    )
    out = resize_images(media, 16, 12).collect()[0]
    with Image.open(io.BytesIO(bytes(out.payload))) as im:
        assert (im.width, im.height) == (16, 12)


@pytest.mark.skipif(not _HAS_SOUNDFILE, reason="soundfile not installed")
def test_audio_decode_with_soundfile():
    assert _decode_audio(_wav(256, 2))["width"] == 256
