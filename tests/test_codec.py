"""Codec unit tests: lossless PNG roundtrip, fake-JPEG PSNR floor,
header parses, corruption behavior (FIXTURES.md §1)."""

import numpy as np

from metacheck_spark.fixtures import codec


def _arr(seed=0, w=32, h=24):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    a = _arr()
    b = codec.png_encode(a)
    out = codec.decode(b)
    assert out is not None and np.array_equal(out, a)
    assert codec.psnr(a, out) == float("inf")


def test_jpeg_roundtrip_psnr_above_40():
    a = _arr(1)
    b = codec.jpeg_encode(a)
    out = codec.decode(b)
    assert out is not None and out.shape == a.shape
    # lossy path must stay >= 40 dB (BASELINE.json input_hint)
    assert codec.psnr(a, out) >= 40.0


def test_sniff_and_header_dims():
    a = _arr(2, w=48, h=16)
    png, jpg = codec.png_encode(a), codec.jpeg_encode(a)
    assert codec.sniff_format(png) == "png"
    assert codec.sniff_format(jpg) == "jpeg"
    assert codec.sniff_format(b"\x00\x01") is None
    assert codec.header_dims(png) == (48, 16)
    assert codec.header_dims(jpg) == (48, 16)


def test_truncated_bytes_fail_decode_but_keep_header():
    a = _arr(3)
    b = codec.png_encode(a)
    trunc = b[: len(b) // 3]
    assert codec.decode(trunc) is None
    assert codec.header_dims(trunc) == (32, 24)  # header intact -> P001 can
    # still abstain correctly while X001 fires


def test_phash_deterministic_and_sensitive():
    a = _arr(4)
    h1 = codec.average_phash(a)
    h2 = codec.average_phash(a.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    flipped = a.copy()
    flipped[:12] = 255 - flipped[:12]
    assert codec.average_phash(flipped) != h1
