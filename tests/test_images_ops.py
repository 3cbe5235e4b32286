"""Multimodal operator tests: image feature extraction + thumbnails, WAV
audio features, and video frame sampling over binary columns."""

import numpy as np
import pytest

from metacheck_spark.fixtures import codec
from metacheck_spark.operators.images import (
    audio_features,
    block_mean_resize,
    extract_features,
    sample_video_frames,
    thumbnails,
)


def test_extract_features(spark, images_dir):
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    feats = {r["image_id"]: r for r in extract_features(images).collect()}
    rows = {r["image_id"]: r for r in images.collect()}
    assert set(feats) == set(rows)
    ok = [f for f in feats.values() if f["decoded_ok"]]
    assert len(ok) > 500
    for f in list(ok)[:50]:
        arr = codec.decode(bytes(rows[f["image_id"]]["bytes"]))
        assert (f["width"], f["height"]) == (arr.shape[1], arr.shape[0])
        assert f["phash"] == codec.average_phash(arr)
        assert 0.0 <= f["mean_r"] <= 255.0


def test_thumbnails(spark, images_dir):
    images = spark.read.parquet(f"{images_dir}/images.parquet").limit(40)
    thumbs = thumbnails(images, 8, 8).collect()
    assert len(thumbs) > 30
    for t in thumbs[:10]:
        arr = codec.decode(bytes(t["thumb"]))
        assert arr.shape == (8, 8, 3)


def test_block_mean_resize_exact():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    a[:2] = 100
    a[2:] = 200
    out = block_mean_resize(a, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out[0] == 100).all() and (out[1] == 200).all()


def _sine(rate, secs, freq, amp=10000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_audio_features(spark):
    rate = 8000
    clips = [
        ("a", bytearray(codec.wav_encode(_sine(rate, 0.5, 440), rate))),
        ("b", bytearray(codec.wav_encode(np.zeros(rate, dtype=np.int16), rate))),
        ("bad", bytearray(b"not a wav file")),
        ("empty", None),
    ]
    df = spark.createDataFrame(clips, "clip_id string, audio binary")
    got = {r["clip_id"]: r for r in audio_features(df).collect()}
    assert got["a"]["decoded_ok"] and got["a"]["sample_rate"] == rate
    assert abs(got["a"]["duration_s"] - 0.5) < 1e-9
    # RMS of a sine = amp/sqrt(2)
    assert abs(got["a"]["rms"] - 10000 / np.sqrt(2)) < 50
    assert got["b"]["decoded_ok"] and got["b"]["rms"] == 0.0
    assert not got["bad"]["decoded_ok"] and not got["empty"]["decoded_ok"]


def test_video_frame_sampling(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    frames = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(6)]
    vids = [
        ("v1", bytearray(codec.video_encode(frames))),
        ("bad", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(vids, "video_id string, video binary")
    got = {r["video_id"]: r for r in sample_video_frames(df, every_n=2).collect()}
    assert got["v1"]["n_frames"] == 6 and got["v1"]["n_sampled"] == 3
    # sampled phashes match direct decode of frames 0, 2, 4
    want = [
        codec.average_phash(codec.decode(codec.jpeg_encode(frames[i])))
        for i in (0, 2, 4)
    ]
    assert list(got["v1"]["frame_phashes"]) == want
    assert got["bad"]["n_frames"] == 0 and got["bad"]["n_sampled"] == 0
