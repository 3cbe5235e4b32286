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


# --- REAL baseline JFIF (fixtures/jfif.py) ----------------------------------


def _smooth(seed=0, w=64, h=48):
    rng = np.random.Generator(np.random.PCG64(seed))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [128 + 90 * np.sin(2 * np.pi * xx / w + c) * np.cos(2 * np.pi * yy / h)
         for c in range(3)],
        axis=2,
    )
    return np.clip(
        np.round(base) + rng.integers(-2, 3, (h, w, 3)), 0, 255
    ).astype(np.uint8)


def test_jfif_roundtrip_psnr_smooth_q90():
    """The real lossy codec holds the 40 dB target on photograph-like
    content at quality 90 (BASELINE.json input_hint, true lossy format)."""
    from metacheck_spark.fixtures import jfif

    a = _smooth(7)
    b = jfif.jfif_encode(a, quality=90)
    out = codec.decode(b)
    assert out is not None and out.shape == a.shape
    assert codec.psnr(a, out) >= 40.0


def test_jfif_roundtrip_noise_high_quality():
    """Uniform noise — the pathological case for a DCT codec — still
    clears 40 dB at quality 98 (near-unit quant divisors), proving the
    codec itself rather than friendly content."""
    from metacheck_spark.fixtures import jfif

    a = _arr(11, w=56, h=40)
    out = codec.decode(jfif.jfif_encode(a, quality=98))
    assert out is not None
    assert codec.psnr(a, out) >= 40.0


def test_jfif_420_decode_path():
    """The decoder's general MCU path: 4:2:0 sampling factors, chroma
    upsampling, odd dimensions."""
    from metacheck_spark.fixtures import jfif

    a = _smooth(9, w=23, h=17)
    b = jfif.jfif_encode(a, quality=90, subsampling="420")
    out = codec.decode(b)
    assert out is not None and out.shape == a.shape
    assert codec.psnr(a, out) >= 25.0  # subsampled chroma: no 40 dB claim


def test_jfif_tables_read_from_stream_not_assumed():
    """Decoder honors DQT/DHT from the stream: re-encode with a different
    quality (different quant tables) and confirm the decode tracks it."""
    from metacheck_spark.fixtures import jfif

    a = _smooth(13)
    lo = codec.decode(jfif.jfif_encode(a, quality=30))
    hi = codec.decode(jfif.jfif_encode(a, quality=95))
    assert lo is not None and hi is not None
    assert codec.psnr(a, hi) > codec.psnr(a, lo) + 5.0


def test_jfif_sniff_header_dims_and_truncation():
    from metacheck_spark.fixtures import jfif

    a = _smooth(15, w=48, h=16)
    b = jfif.jfif_encode(a, quality=92)
    assert codec.sniff_format(b) == "jpeg"
    assert codec.is_real_jfif(b) and not codec.is_real_jfif(codec.jpeg_encode(a))
    assert codec.header_dims(b) == (48, 16)
    assert codec.decode(b[: len(b) // 3]) is None  # truncated: no EOI
    assert codec.decode(b"\xff\xd8\xff\xe0" + b"\x00" * 200) is None
    # progressive SOF2 is out of scope -> None, not garbage
    prog = b.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert codec.decode(prog) is None


def test_jfif_restart_marker_decode():
    """Restart-interval streams (DRI + RSTn) decode correctly: splice a
    DRI segment + restart markers into an encoder stream re-encoded per
    MCU row."""
    import struct

    from metacheck_spark.fixtures import jfif

    a = _smooth(21, w=32, h=16)
    b = jfif.jfif_encode(a, quality=90)
    base = codec.decode(b)
    # hand-build a restarted stream: re-encode each MCU row separately and
    # join with RSTn, declaring DRI = MCUs per row (4 for w=32 at 4:4:4)
    h, w = 16, 32
    ycc = jfif.rgb_to_ycbcr(a)
    qt_l, qt_c = jfif.scaled_tables(90)
    rows = []
    for my in range(2):  # 2 MCU rows of 8 px
        bw = jfif._BitWriter()
        pred = [0, 0, 0]
        for mx in range(4):
            for ci in range(3):
                blk8 = ycc[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8, ci] - 128.0
                coef = jfif._D @ blk8 @ jfif._D.T
                q = qt_l if ci == 0 else qt_c
                zz = np.round(coef / q).astype(np.int64).reshape(64)[jfif.ZIGZAG]
                pred[ci] = jfif._encode_block(bw, zz, pred[ci])
        rows.append(bw.flush())
    sos_at = b.index(b"\xff\xda")
    head, tail = b[:sos_at], b[sos_at:]
    sos_len = struct.unpack(">H", tail[2:4])[0]
    sos = tail[: 2 + sos_len]
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 4)
    entropy = rows[0] + b"\xff\xd0" + rows[1]
    restarted = head + dri + sos + entropy + b"\xff\xd9"
    out = codec.decode(restarted)
    assert out is not None and np.array_equal(out, base)
