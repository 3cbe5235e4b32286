#!/usr/bin/env python
"""Generate the frozen expected-output parquet tables for the five
binary-codec queries (round-5 ask #1: promote the rows-only driver
checks to hash-checked oracles).

DuckDB cannot decode JFIF/WAV/video containers, so these oracles work
the other way around: this script derives each query's expected output
ROW-AT-A-TIME in pure Python — the structural opposite of the Spark
operators' Arrow-batched mapInPandas kernels — from the pure-Python
codec primitives (metacheck_spark/fixtures/codec.py, the same shared
layer the label oracle in fixtures/oracle.py builds on) and the
deterministic fixture generators, and freezes the result as parquet
under metacheck_spark/fixtures/expected/. oracle_sql() then simply
SELECTs from the frozen table, and the driver's value-hash comparison
gates the Spark output against it.

Everything here is a pure function of the row index (PCG64-seeded
generators, no wall clock), so regeneration is bit-stable;
tests/test_expected_tables.py regenerates into a temp dir and asserts
byte-identity with the committed files to catch drift.

Spark semantics reproduced deliberately:
* F.round(double, n) = BigDecimal.valueOf(d).setScale(n, HALF_UP):
  Decimal(repr(x)).quantize(..., ROUND_HALF_UP) is the exact Python
  equivalent (both go through the shortest decimal representation).
* pmod(phash, 32) on possibly-negative int64 = Python's non-negative %.
* block-mean resize is re-derived here with explicit per-block loops
  (integer bin edges, float means, truncating uint8 cast) rather than
  the vectorized reduceat kernel in operators/images.py.
"""

from __future__ import annotations

import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "metacheck_spark", "fixtures", "expected",
)


def spark_round(x: float | None, scale: int) -> float | None:
    if x is None:
        return None
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def expected_image_features(n: int = 300) -> dict[str, list]:
    from metacheck_spark.fixtures import codec
    from metacheck_spark.fixtures.gen_images import gen_row

    cols: dict[str, list] = {k: [] for k in (
        "image_id", "decoded_ok", "width", "height",
        "mean_r", "mean_g", "mean_b", "phash",
    )}
    for i in range(n):
        r = gen_row(i)
        arr = codec.decode(r["bytes"])
        cols["image_id"].append(r["image_id"])
        if arr is None:
            cols["decoded_ok"].append(False)
            for k in ("width", "height", "mean_r", "mean_g", "mean_b", "phash"):
                cols[k].append(None)
            continue
        h, w, _ = arr.shape
        # per-channel mean as an explicit double sum, not ndarray.mean
        tot = [0.0, 0.0, 0.0]
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    tot[c] += float(arr[y, x, c])
        cols["decoded_ok"].append(True)
        cols["width"].append(w)
        cols["height"].append(h)
        cols["mean_r"].append(spark_round(tot[0] / (h * w), 4))
        cols["mean_g"].append(spark_round(tot[1] / (h * w), 4))
        cols["mean_b"].append(spark_round(tot[2] / (h * w), 4))
        cols["phash"].append(codec.average_phash(arr))
    return cols


def _block_mean(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Independent re-derivation of the area-average resize: integer bin
    edges, per-block double mean, truncating uint8 cast."""
    h, w, _ = arr.shape
    out = np.zeros((th, tw, 3), dtype=np.uint8)
    for by in range(th):
        y0, y1 = (by * h) // th, ((by + 1) * h) // th
        for bx in range(tw):
            x0, x1 = (bx * w) // tw, ((bx + 1) * w) // tw
            for c in range(3):
                tot = 0.0
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        tot += float(arr[y, x, c])
                out[by, bx, c] = int(tot / ((y1 - y0) * (x1 - x0)))
    return out


def expected_thumbnails(n: int = 200, tw: int = 8, th: int = 8) -> dict[str, list]:
    from metacheck_spark.fixtures import codec
    from metacheck_spark.fixtures.gen_images import gen_row

    cols: dict[str, list] = {k: [] for k in ("image_id", "tw", "th", "thumb_bytes")}
    for i in range(n):
        r = gen_row(i)
        arr = codec.decode(r["bytes"])
        if arr is None:
            continue  # corrupt rows are dropped from the thumb set
        thumb = codec.png_encode(_block_mean(arr, tw, th))
        cols["image_id"].append(r["image_id"])
        cols["tw"].append(tw)
        cols["th"].append(th)
        cols["thumb_bytes"].append(len(thumb))
    return cols


def expected_audio_features(n: int = 200) -> dict[str, list]:
    from metacheck_spark.fixtures import codec

    cols: dict[str, list] = {k: [] for k in (
        "clip_id", "decoded_ok", "sample_rate", "duration_s", "rms", "peak",
    )}
    for i in range(n):
        # the same deterministic clip formula q_audio_features synthesizes
        rate = 8000
        t = np.arange(rate // 2) / rate
        freq = 200 + (i % 20) * 40
        s = (9000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        samples, got_rate = codec.wav_decode(bytes(codec.wav_encode(s, rate)))
        sq = 0.0
        peak = 0
        for v in samples:
            sq += float(v) * float(v)
            peak = max(peak, abs(int(v)))
        cols["clip_id"].append(f"clip_{i:06d}")
        cols["decoded_ok"].append(True)
        cols["sample_rate"].append(got_rate)
        cols["duration_s"].append(spark_round(len(samples) / got_rate, 6))
        cols["rms"].append(spark_round(math.sqrt(sq / len(samples)), 2))
        cols["peak"].append(peak)
    return cols


def expected_video_frames(n: int = 100, every_n: int = 2) -> dict[str, list]:
    from metacheck_spark.fixtures import codec

    cols: dict[str, list] = {k: [] for k in (
        "video_id", "n_frames", "n_sampled", "phashes",
    )}
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(1000 + i))
        frames = [
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(3 + i % 4)
        ]
        b = bytes(codec.video_encode(frames))
        offs = codec.video_frame_offsets(b)
        # phash over the container round-trip (the per-frame codec is
        # lossy), not over the pre-encode arrays
        sampled = [
            codec.average_phash(codec.decode(bytes(codec.jpeg_encode(f))))
            for f in frames[::every_n]
        ]
        cols["video_id"].append(f"vid_{i:06d}")
        cols["n_frames"].append(len(offs))
        cols["n_sampled"].append(len(sampled))
        cols["phashes"].append(",".join(str(p) for p in sampled))
    return cols


def expected_image_pipeline(n: int = 300, buckets: int = 32) -> dict[str, list]:
    from metacheck_spark.fixtures.gen_images import gen_rows, url_status_map
    from metacheck_spark.fixtures.oracle import label_rows

    rows = gen_rows(n)
    labels = label_rows(rows, url_status_map())
    cols: dict[str, list] = {k: [] for k in (
        "image_id", "rule_hits", "n_pitfalls", "n_warnings", "keep",
        "lang", "ppl", "scrubbed_caption", "bucket",
    )}
    for r, l in zip(rows, labels):
        cols["image_id"].append(l["image_id"])
        cols["rule_hits"].append(",".join(l["rule_hits"]))
        cols["n_pitfalls"].append(l["n_pitfalls"])
        cols["n_warnings"].append(l["n_warnings"])
        cols["keep"].append(l["keep"])
        cols["lang"].append(l["lang"])
        cols["ppl"].append(l["ppl"])
        cols["scrubbed_caption"].append(l["scrubbed_caption"])
        cols["bucket"].append(r["phash"] % buckets)
    return cols


TYPES = {
    "image_features": {
        "image_id": "string", "decoded_ok": "bool", "width": "int32",
        "height": "int32", "mean_r": "float64", "mean_g": "float64",
        "mean_b": "float64", "phash": "int64",
    },
    "thumbnails": {
        "image_id": "string", "tw": "int32", "th": "int32",
        "thumb_bytes": "int32",
    },
    "audio_features": {
        "clip_id": "string", "decoded_ok": "bool", "sample_rate": "int32",
        "duration_s": "float64", "rms": "float64", "peak": "int32",
    },
    "video_frames": {
        "video_id": "string", "n_frames": "int32", "n_sampled": "int32",
        "phashes": "string",
    },
    "image_pipeline": {
        "image_id": "string", "rule_hits": "string", "n_pitfalls": "int32",
        "n_warnings": "int32", "keep": "bool", "lang": "string",
        "ppl": "float64", "scrubbed_caption": "string", "bucket": "int32",
    },
}

BUILDERS = {
    "image_features": expected_image_features,
    "thumbnails": expected_thumbnails,
    "audio_features": expected_audio_features,
    "video_frames": expected_video_frames,
    "image_pipeline": expected_image_pipeline,
}


def write_expected(out_dir: str = EXPECTED_DIR) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, build in BUILDERS.items():
        cols = build()
        schema = pa.schema(
            [(c, pa.type_for_alias(t)) for c, t in TYPES[name].items()]
        )
        table = pa.table(
            {c: pa.array(cols[c], type=pa.type_for_alias(TYPES[name][c]))
             for c in TYPES[name]},
            schema=schema,
        )
        path = os.path.join(out_dir, f"{name}.parquet")
        # fixed metadata for byte-stable regeneration
        pq.write_table(table, path, compression="snappy",
                       data_page_version="1.0")
        written.append(path)
        print(f"[gen_expected] {path}: {table.num_rows} rows")
    return written


if __name__ == "__main__":
    write_expected(sys.argv[1] if len(sys.argv) > 1 else EXPECTED_DIR)
