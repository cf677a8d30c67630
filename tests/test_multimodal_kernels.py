"""Kernel dispatch in operators.multimodal.

The metadata decode seam has three tiers (library -> stdlib header
parse -> deterministic fake); pixel/sample kernels (PNG codec, WAV
samples) are pure numpy/stdlib and run for real in this container —
PIL/soundfile-present parity is covered by self-skipping tests."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from peterman_search_engine_spark.operators.multimodal import (
    _HAS_PIL,
    _HAS_SOUNDFILE,
    _PNG_SIG,
    _decode_audio,
    _decode_image,
    attach_fake_media,
    audio_sample_stats,
    extract_features,
    png_decode,
    png_encode,
    resize_bilinear,
    resize_images,
    wav_samples,
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


def _rng_img(h, w, c, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


def _filter_line(ft, line, prev, ch):
    """Forward PNG scanline filter (spec direction) — the test-side
    reference the decoder must invert."""
    out = bytearray(len(line))
    for x in range(len(line)):
        a = line[x - ch] if x >= ch else 0
        b = prev[x]
        c = prev[x - ch] if x >= ch else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def test_png_roundtrip_pure_codec():
    for shape in ((5, 7, 3), (4, 4, 4), (3, 9, 1)):
        img = _rng_img(*shape)
        assert np.array_equal(png_decode(png_encode(img)), img), shape


def test_png_decode_all_filters():
    """Hand-filter every scanline with a different filter type (the
    spec-direction reference above); the decoder must recover the
    exact pixels."""
    img = _rng_img(5, 6, 3, seed=11)
    h, w, ch = img.shape
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        line = img[y].tobytes()
        ft = y % 5
        raw.append(ft)
        raw += _filter_line(ft, line, prev, ch)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    payload = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(payload), img)


def test_resize_bilinear_reference():
    # 2x upscale of a constant image stays constant; a gradient stays
    # monotone and keeps the corner values (edge-clamped centers)
    const = np.full((3, 3, 3), 200, np.uint8)
    assert (resize_bilinear(const, 6, 6) == 200).all()
    grad = np.tile(np.arange(0, 160, 20, dtype=np.uint8)[None, :, None], (4, 1, 3))
    out = resize_bilinear(grad, 16, 4)
    assert out[0, 0, 0] == 0 and out[0, -1, 0] == 140
    assert (np.diff(out[0, :, 0].astype(int)) >= 0).all()
    # identity resize is exact
    img = _rng_img(6, 5, 3, seed=3)
    assert np.array_equal(resize_bilinear(img, 5, 6), img)


def test_resize_images_pure_python(spark):
    """The kernel that used to raise without PIL now does real pixel
    work: decode -> bilinear -> re-encode, end-to-end through Spark."""
    img = _rng_img(8, 8, 3, seed=5)
    media = spark.createDataFrame(
        [(0, "image", bytearray(png_encode(img)))],
        "doc_id long, media_type string, payload binary",
    )
    out = resize_images(media, 4, 4).collect()[0]
    got = png_decode(bytes(out.payload))
    assert got.shape == (4, 4, 3)
    if not _HAS_PIL:  # the pure path is deterministic — assert exactly
        assert np.array_equal(got, resize_bilinear(img, 4, 4))


def test_resize_images_rejects_undecodable(spark):
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(Exception) as ei:
        resize_images(attach_fake_media(docs), 32, 32).collect()
    assert "PNG" in str(ei.value) or "ValueError" in str(ei.value)


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed")
def test_pure_codec_matches_pil():
    from PIL import Image

    img = _rng_img(9, 7, 3, seed=2)
    with Image.open(io.BytesIO(png_encode(img))) as im:
        assert np.array_equal(np.asarray(im), img)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert np.array_equal(png_decode(buf.getvalue()), img)


def _wav_pcm(samples: np.ndarray, channels: int, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_samples_real_frames():
    s = np.array([[0, 100], [-200, 300], [400, -32768]], dtype=np.int16)
    got = wav_samples(_wav_pcm(s.reshape(-1), 2))
    assert got.shape == (3, 2)
    assert np.array_equal(got, s.astype(np.int32))
    with pytest.raises(ValueError):
        wav_samples(b"not audio")


def test_audio_sample_stats_operator(spark):
    s = np.array([3, -4, 0, 0], dtype=np.int16)  # rms = sqrt(25/4) = 2.5
    media = spark.createDataFrame(
        [(7, "audio", bytearray(_wav_pcm(s, 1)))],
        "doc_id long, media_type string, payload binary",
    )
    row = audio_sample_stats(media).collect()[0]
    assert (row.n_frames, row.n_channels, row.peak) == (4, 1, 4)
    assert row.rms_e6 == 2_500_000


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
