"""Multimodal (image/audio/video) operators: binary payload + typed
metadata, processed in Arrow batches via mapInPandas / pandas UDFs.

The container ships no image/audio libraries (no PIL/ffmpeg), so every
codec here is implemented in-repo and REAL:
* images: PNG, baseline JFIF (fixtures/jfif.py — full DCT/quant/Huffman
  round-trip, PSNR >= 40 dB), and the legacy fake-JPEG wrapper, all via
  fixtures/codec.py;
* audio: RIFF/WAVE PCM16 header parse + sample decode (audio_features);
* video: container header parse + offset-seek every-Nth-frame sampling
  (sample_video_frames — skipped frames are never decompressed).
All are pytest-verified (tests/test_images_ops.py, tests/test_codec.py).
At production scale the pure-numpy codecs swap for native ones
(libjpeg-turbo / ffmpeg) behind the same decode interfaces; the Spark
plumbing (schemas, Arrow batching, partitioning) is the part that
carries over unchanged.
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


# --- audio: real RIFF/PCM16 decode (stdlib struct + numpy; codec.py) --------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("decoded_ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_features(clips: DataFrame, id_col: str = "clip_id", bytes_col: str = "audio") -> DataFrame:
    """Per-clip features (duration, RMS, peak) via mapInPandas over the
    binary column — same Arrow-batch plumbing as image decode. WAV/PCM16
    decode is REAL (fixtures/codec.py wav_decode); compressed codecs (mp3/
    opus) would slot in behind the same decode call when a codec library
    is available."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metacheck_spark.fixtures import codec

        for pdf in batches:
            recs = []
            for cid, b in zip(pdf[id_col], pdf[bytes_col]):
                d = codec.wav_decode(bytes(b)) if b is not None else None
                if d is None:
                    recs.append((cid, False, None, None, None, None))
                else:
                    samples, rate = d
                    x = samples.astype(np.float64)
                    recs.append(
                        (
                            cid,
                            True,
                            rate,
                            len(samples) / rate if rate else None,
                            float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                            int(np.abs(samples).max()) if len(samples) else 0,
                        )
                    )
            cols = list(zip(*recs)) if recs else [[]] * 6
            yield pd.DataFrame(
                {
                    "clip_id": list(cols[0]),
                    "decoded_ok": list(cols[1]),
                    "sample_rate": pd.array(cols[2], dtype="Int32"),
                    "duration_s": pd.array(cols[3], dtype="float64"),
                    "rms": pd.array(cols[4], dtype="float64"),
                    "peak": pd.array(cols[5], dtype="Int32"),
                }
            )

    return clips.select(id_col, bytes_col).mapInPandas(op, AUDIO_FEATURES_SCHEMA)


# --- video: frame sampling over the deterministic container (codec.py) ------

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("frame_phashes", T.ArrayType(T.LongType())),
    ]
)


def sample_video_frames(
    videos: DataFrame,
    every_n: int = 2,
    id_col: str = "video_id",
    bytes_col: str = "video",
) -> DataFrame:
    """Every-Nth-frame sampling + per-frame phash via mapInPandas. The
    container index is walked by offset, so skipped frames are never
    decompressed — the property that matters when the payload is a
    multi-GB video and only keyframes are wanted. The container format is
    the deterministic sandbox stand-in (codec.py VIDEO_MAGIC); a real
    demuxer would replace video_frame_offsets/decode only."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metacheck_spark.fixtures import codec

        for pdf in batches:
            recs = []
            for vid, b in zip(pdf[id_col], pdf[bytes_col]):
                bb = bytes(b) if b is not None else None
                offs = codec.video_frame_offsets(bb)
                frames = codec.video_sample_frames(bb, every_n)
                recs.append(
                    (
                        vid,
                        len(offs),
                        len(frames),
                        [codec.average_phash(f) for f in frames],
                    )
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in VIDEO_FRAMES_SCHEMA.fields]
            )

    return videos.select(id_col, bytes_col).mapInPandas(op, VIDEO_FRAMES_SCHEMA)
