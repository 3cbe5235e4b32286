"""Multimodal operator tests: feature extraction + thumbnails over the
generated images table; stubs raise cleanly."""

import numpy as np
import pytest

from metacheck_spark.fixtures import codec
from metacheck_spark.operators.images import (
    block_mean_resize,
    decode_audio,
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


def test_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_audio(b"")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"")
