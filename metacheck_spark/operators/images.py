"""Multimodal (image/audio/video) operators: binary payload + typed
metadata, processed in Arrow batches via mapInPandas / pandas UDFs.

The container ships no image/audio libraries (no PIL/ffmpeg), so:
* PNG + the deterministic fake JPEG decode are REAL (fixtures/codec.py);
* audio decode and video frame-sampling are STUBS raising
  NotImplementedError, with the Spark-side plumbing (schemas, batch
  iteration, partitioning) real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("decoded_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("tw", T.IntegerType()),
        T.StructField("th", T.IntegerType()),
    ]
)


def block_mean_resize(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic area-average resize (no interpolation libraries):
    integer bin edges + per-block means."""
    h, w, c = arr.shape
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    rowsum = np.add.reduceat(arr.astype(np.float64), ys[:-1], axis=0)
    blocks = np.add.reduceat(rowsum, xs[:-1], axis=1)
    areas = np.outer(np.diff(ys), np.diff(xs))[:, :, None]
    return (blocks / areas).astype(np.uint8)


def extract_features(images: DataFrame) -> DataFrame:
    """Per-image features (dims, channel means, recomputed phash) via
    mapInPandas — only `image_id` and `bytes` are read (column pruning)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metacheck_spark.fixtures import codec

        for pdf in batches:
            recs = []
            for iid, b in zip(pdf["image_id"], pdf["bytes"]):
                arr = codec.decode(bytes(b)) if b is not None else None
                if arr is None:
                    recs.append((iid, False, None, None, None, None, None, None))
                else:
                    m = arr.mean(axis=(0, 1))
                    recs.append(
                        (iid, True, arr.shape[1], arr.shape[0],
                         float(m[0]), float(m[1]), float(m[2]),
                         codec.average_phash(arr))
                    )
            cols = list(zip(*recs)) if recs else [[]] * 8
            # Nullable Int dtypes from the start: pd.DataFrame would coerce
            # int+None tuples to float64, truncating 64-bit hashes.
            yield pd.DataFrame(
                {
                    "image_id": list(cols[0]),
                    "decoded_ok": list(cols[1]),
                    "width": pd.array(cols[2], dtype="Int32"),
                    "height": pd.array(cols[3], dtype="Int32"),
                    "mean_r": pd.array(cols[4], dtype="float64"),
                    "mean_g": pd.array(cols[5], dtype="float64"),
                    "mean_b": pd.array(cols[6], dtype="float64"),
                    "phash": pd.array(cols[7], dtype="Int64"),
                }
            )

    return images.select("image_id", "bytes").mapInPandas(op, FEATURES_SCHEMA)


def thumbnails(images: DataFrame, tw: int = 8, th: int = 8) -> DataFrame:
    """Decode -> block-mean resize -> re-encode (PNG) in Arrow batches."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metacheck_spark.fixtures import codec

        for pdf in batches:
            recs = []
            for iid, b in zip(pdf["image_id"], pdf["bytes"]):
                arr = codec.decode(bytes(b)) if b is not None else None
                if arr is None:
                    continue  # corrupt rows are dropped from the thumb set
                recs.append(
                    (iid, codec.png_encode(block_mean_resize(arr, tw, th)), tw, th)
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in THUMB_SCHEMA.fields]
            )

    return images.select("image_id", "bytes").mapInPandas(op, THUMB_SCHEMA)


# --- stubs: libraries absent in this container ------------------------------


def decode_audio(samples: bytes) -> np.ndarray:  # pragma: no cover - stub
    """STUB: audio decode requires an audio codec library not present in
    this container. The Spark plumbing (binary column + mapInPandas batch
    shape) is identical to extract_features."""
    raise NotImplementedError("audio decode requires an audio codec library")


def sample_video_frames(payload: bytes, every_n: int = 30):  # pragma: no cover
    """STUB: video frame sampling requires a video demuxer not present in
    this container."""
    raise NotImplementedError("video frame sampling requires a video demuxer")
