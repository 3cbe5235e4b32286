"""Deterministic generator for the primary `images` table
(BASELINE.json input_hint: image_id, bytes, w, h, fmt, caption, phash)
plus the frozen `url_status` dimension (FIXTURES.md §1).

Everything is a pure function of (seed, row index): per-row
numpy.random.Generator(PCG64(seed + i)), no wall clock, no network. The
caption corpus is Zipfian over 12 languages (skew is intentional — the
pipeline's salted repartition exists because of it), with controlled
fractions of rule-trigger and decoy snippets.

Writable at any scale; tests use 10^3-10^4 rows, bench 10^5+.
"""

from __future__ import annotations

import numpy as np

from metacheck_spark.fixtures import codec, jfif
from metacheck_spark.functions.langid import LANGS, LEXICONS

# fraction boundaries of the fmt draw: <0.6 png, <0.9 fake-jpeg (legacy
# marked codec), else REAL baseline JFIF (fixtures/jfif.py)
JFIF_QUALITY = 95

DIM_CHOICES = [16, 24, 32, 48, 64]  # kept small for sandbox speed; the
# schema/codecs support any size (FIXTURES.md specifies up to 512)

# --- URL pools with frozen statuses (replaces live HTTP of the reference's
# p013/p025 detectors) ------------------------------------------------------
OK_URLS = [f"https://img{k}.example.org/p{k}" for k in range(20)]
REDIRECT_URLS = [f"https://moved{k}.example.org/p{k}" for k in range(8)]
BROKEN_URLS = [f"https://gone{k}.example.org/p{k}" for k in range(8)]
SPECIAL_URLS = [
    "https://proj.readthedocs.io/en/latest",   # P006 trigger
    "https://zenodo.org/record/123",           # P007 trigger
    "https://www.photosite.com/gallery",       # P016 trigger
    "https://papers.example.org/p1",           # P011 trigger
    "https://doi.org/10.9999/xyz",             # W014 trigger
    "https://example.org/page",                # benign
]


def url_status_rows() -> list[tuple[str, int | None, str | None]]:
    rows = [(u, 200, None) for u in OK_URLS + SPECIAL_URLS]
    rows += [(u, 301, None) for u in REDIRECT_URLS]
    for k, u in enumerate(BROKEN_URLS):
        if k % 3 == 2:
            rows.append((u, None, "timeout"))
        else:
            rows.append((u, 404 if k % 2 == 0 else 500, None))
    return rows


def url_status_map() -> dict[str, int]:
    """url -> status; timeout/error rows map to -1 (inaccessible), matching
    the Spark side's coalesce(status_code, -1) after the broadcast join.
    URLs absent from the dimension are unknown -> rules abstain."""
    return {u: (c if c is not None else -1) for u, c, _ in url_status_rows()}


# --- caption triggers -------------------------------------------------------
# Each entry: (rule code it targets, snippet builder(rng) -> str, mode)
# mode 'append' adds to the base caption; 'replace' replaces it entirely.

def _dates_pair(rng, gap_days: int) -> str:
    from datetime import date, timedelta

    base = date(2024, 1, 1) + timedelta(days=int(rng.integers(0, 300)))
    upd = base + timedelta(days=gap_days)
    fmts = ["%Y-%m-%d", "%Y-%m-%dT%H:%M:%SZ", "%d-%m-%Y", "%Y/%m/%d", "%b %d, %Y"]
    f1 = fmts[int(rng.integers(0, len(fmts)))]
    f2 = fmts[int(rng.integers(0, len(fmts)))]
    try:
        u = upd.strftime(f1).replace("T00:00:00Z", "T10:30:00Z")
        m = base.strftime(f2).replace("T00:00:00Z", "T08:00:00Z")
    except ValueError:
        u, m = str(upd), str(base)
    return f"updated: {u} modified: {m}"


TRIGGERS = [
    ("P002", lambda rng: "template <year> included", "append"),
    ("W003", lambda rng: "requires numpy", "append"),
    ("W004", lambda rng: _dates_pair(rng, int(rng.integers(2, 30))), "append"),
    ("P005", lambda rng: "by Alice and Bob", "append"),
    ("P006", lambda rng: "docs at https://proj.readthedocs.io/en/latest", "append"),
    ("P007", lambda rng: "archived at https://zenodo.org/record/123", "append"),
    ("P008", lambda rng: "terms in ./LICENSE.md", "append"),
    ("W010", lambda rng: "written in Python", "append"),
    ("P011", lambda rng: "please cite https://papers.example.org/p1", "append"),
    ("W012", lambda rng: "deps: Numpy Pandas", "append"),
    ("P013", lambda rng: "ref " + BROKEN_URLS[int(rng.integers(0, len(BROKEN_URLS)))], "append"),
    ("W014", lambda rng: "id: mytool see https://doi.org/10.9999/xyz", "append"),
    ("W015", lambda rng: "   " if rng.random() < 0.5 else "", "replace"),
    ("P016", lambda rng: "see https://www.photosite.com/gallery here", "replace_keep_lang"),
    ("P017", lambda rng: "copyright 2020 fox studio", "replace"),
    ("P018", lambda rng: "odd  spacing" if rng.random() < 0.5 else "line\nbreak", "append"),
    ("P020", lambda rng: "https://example.org/page", "replace"),
    ("W021", lambda rng: "tags [red, fox]", "append"),
    ("P022", lambda rng: "licensed under GPL", "append"),
    ("P023", lambda rng: "clone example.com:user/repo.git", "append"),
    ("P024", lambda rng: "doi:10.1234/abc123", "append"),
    ("P025", lambda rng: "ref " + REDIRECT_URLS[int(rng.integers(0, len(REDIRECT_URLS)))], "append"),
    ("P027", lambda rng: "compare v2.0.1 with 2.0.1", "append"),
    ("P028", lambda rng: "swh:1:rev:" + "".join("0123456789abcdef"[b % 16] for b in rng.integers(0, 16, 40)), "append"),
]

DECOYS = [
    lambda rng: "by Smith, Jr.",
    lambda rng: "requires numpy >= 1.4",
    lambda rng: "written in Python 3.11",
    lambda rng: "released under GPL-3.0",
    lambda rng: _dates_pair(rng, 1),
    lambda rng: "see " + OK_URLS[int(rng.integers(0, len(OK_URLS)))],
    lambda rng: "compare v2.0.1 with v2.0.2 and 2.0.2",
]

PII = [
    lambda rng: f"contact user{int(rng.integers(0, 99))}@example.com",
    lambda rng: f"call 555-{int(rng.integers(100, 999))}-{int(rng.integers(1000, 9999))}",
]

GIBBERISH_CHARS = "qxzwjkvfypqxzwjkv"  # consonant soup — bigrams absent
# from the training corpus, so X003 separates cleanly (tests/test_models.py)

# Zipfian language weights (skewed on purpose; 'en' dominates)
_ZIPF = np.array([1.0 / (i + 1) for i in range(len(LANGS))])
_ZIPF = _ZIPF / _ZIPF.sum()


def _base_caption(rng, lang: str, n_words: int) -> str:
    words = LEXICONS[lang]
    idx = rng.integers(0, len(words), n_words)
    return " ".join(words[int(j)] for j in idx)


def _smooth_pixels(arr: np.ndarray, i: int) -> np.ndarray:
    """Low-frequency deterministic content for the REAL-JFIF slice: a real
    DCT codec cannot hold 40 dB on uniform noise at sane qualities (noise
    is the pathological case the fake codec sidestepped), so the real
    slice carries photograph-like smooth content — two-phase sinusoids
    per channel plus +-2 texture reused from the already-drawn noise array
    (no extra rng draws, keeping every other row byte-identical)."""
    h, w, _ = arr.shape
    yy = np.arange(h)[:, None].astype(np.float64)
    xx = np.arange(w)[None, :].astype(np.float64)
    chans = []
    for c in range(3):
        ph = (i % 11) / 11.0 * 2.0 * np.pi + 2.1 * c
        chans.append(
            128.0
            + 96.0 * np.sin(2.0 * np.pi * xx / w + ph)
            * np.cos(2.0 * np.pi * yy / h + 0.7 * c)
        )
    base = np.round(np.stack(chans, axis=2))
    mild = (arr.astype(np.int16) % 5) - 2
    return np.clip(base + mild, 0, 255).astype(np.uint8)


def source_pixels(i: int, seed: int = 42) -> np.ndarray:
    """The pre-encode source array for row i — same draw order as gen_row,
    used by tests for the decoded-pixel PSNR invariant."""
    rng = np.random.Generator(np.random.PCG64(seed + i))
    w = int(DIM_CHOICES[int(rng.integers(0, len(DIM_CHOICES)))])
    h = int(DIM_CHOICES[int(rng.integers(0, len(DIM_CHOICES)))])
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if rng.random() >= 0.9:  # the real-JFIF slice (same draw as gen_row)
        arr = _smooth_pixels(arr, i)
    return arr


def gen_row(i: int, seed: int = 42) -> dict:
    """One deterministic images-table row. Pure function of (seed, i)."""
    rng = np.random.Generator(np.random.PCG64(seed + i))

    # --- image payload ---
    w = int(DIM_CHOICES[int(rng.integers(0, len(DIM_CHOICES)))])
    h = int(DIM_CHOICES[int(rng.integers(0, len(DIM_CHOICES)))])
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    fr = rng.random()
    if fr < 0.6:
        fmt = "png"
        b = codec.png_encode(arr)
    elif fr < 0.9:
        fmt = "jpeg"  # legacy marked fake codec
        b = codec.jpeg_encode(arr)
    else:
        fmt = "jpeg"  # REAL baseline JFIF over smooth content
        arr = _smooth_pixels(arr, i)
        b = jfif.jfif_encode(arr, quality=JFIF_QUALITY)
    phash = codec.average_phash(codec.decode(b))

    # --- controlled corruptions (sanity-rule triggers) ---
    r = rng.random()
    if r < 0.02:  # X001: truncate payload, header left intact
        b = b[: max(24, len(b) // 3)]
    elif r < 0.03:  # P001: declared dims off by one
        w += 1
    elif r < 0.04:  # P026: declared fmt contradicts magic bytes
        fmt = "jpeg" if fmt == "png" else "png"
    elif r < 0.05:  # P019: stored phash corrupted
        phash ^= 0xFFFF

    # --- caption ---
    lang = LANGS[int(rng.choice(len(LANGS), p=_ZIPF))]
    caption = _base_caption(rng, lang, int(rng.integers(6, 14)))

    cr = rng.random()
    if cr < 0.01:  # X002: mixed-language caption -> langid can't decide
        parts = [_base_caption(rng, LANGS[int(j)], 3) for j in rng.choice(len(LANGS), 3, replace=False)]
        caption = " ".join(parts)
    elif cr < 0.02:  # X003: gibberish -> high perplexity
        caption = "".join(
            GIBBERISH_CHARS[int(j)] for j in rng.integers(0, len(GIBBERISH_CHARS), 40)
        )
    elif cr < 0.32:  # one rule trigger (30%)
        code, snip, mode = TRIGGERS[int(rng.integers(0, len(TRIGGERS)))]
        s = snip(rng)
        if mode == "replace":
            caption = s
        elif mode == "replace_keep_lang":
            caption = _base_caption(rng, lang, 3) + " " + s
        else:
            caption = caption + " " + s
        if rng.random() < 0.15:  # occasionally a second trigger
            code2, snip2, mode2 = TRIGGERS[int(rng.integers(0, len(TRIGGERS)))]
            if mode2 == "append" and mode == "append":
                caption = caption + " " + snip2(rng)
    elif cr < 0.45:  # decoy (should NOT fire)
        caption = caption + " " + DECOYS[int(rng.integers(0, len(DECOYS)))](rng)

    if rng.random() < 0.10:  # PII for the scrub stage
        caption = caption + " " + PII[int(rng.integers(0, len(PII)))](rng)
    if rng.random() < 0.05:  # toxicity for the scrub stage
        from metacheck_spark.functions.patterns import TOXIC_LEXICON

        caption = caption + " " + TOXIC_LEXICON[int(rng.integers(0, len(TOXIC_LEXICON)))]

    return {
        "image_id": f"img_{i:012d}",
        "bytes": b,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
    }


def gen_rows(n: int, seed: int = 42, start: int = 0) -> list[dict]:
    return [gen_row(i, seed) for i in range(start, start + n)]


def gen_images_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed images-table generation: gen_row is a pure function of
    (seed, index), so executors build their own slices via mapInPandas over
    spark.range — no driver-side row loop, scales to any n."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from metacheck_spark.schemas import IMAGES_SCHEMA

    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    cols = [f.name for f in IMAGES_SCHEMA.fields]

    def gen(batches):
        for pdf in batches:
            rows = [gen_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(0, n, 1, parts).mapInPandas(gen, IMAGES_SCHEMA)


def write_images_parquet(path: str, n: int, seed: int = 42) -> None:
    """Write the images table + url_status dim as parquet at `path`/."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = gen_rows(n, seed)
    table = pa.table(
        {
            "image_id": [r["image_id"] for r in rows],
            "bytes": pa.array([r["bytes"] for r in rows], type=pa.binary()),
            "w": pa.array([r["w"] for r in rows], type=pa.int32()),
            "h": pa.array([r["h"] for r in rows], type=pa.int32()),
            "fmt": [r["fmt"] for r in rows],
            "caption": [r["caption"] for r in rows],
            "phash": pa.array([r["phash"] for r in rows], type=pa.int64()),
        }
    )
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(table, f"{path}/images.parquet")
    us = url_status_rows()
    pq.write_table(
        pa.table(
            {
                "url": [u for u, _, _ in us],
                "status_code": pa.array([c for _, c, _ in us], type=pa.int32()),
                "error": [e for _, _, e in us],
            }
        ),
        f"{path}/url_status.parquet",
    )
