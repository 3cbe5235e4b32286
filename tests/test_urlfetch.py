"""Tier-3 live URL checking (sources/urlfetch.py): the batched
mapInPandas fetch must produce the same dimension the frozen parquet
provides, so the two modes are interchangeable behind one interface —
and each distinct URL is fetched exactly once."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metacheck_spark.fixtures.gen_images import url_status_rows
from metacheck_spark.pipeline import make_caption_stage_udf
from metacheck_spark.sources.urlfetch import (
    _DET_CODES,
    deterministic_fetcher,
    distinct_urls,
    live_url_status,
)


def _frozen_fetcher():
    """A fetch_one that replays the frozen dimension — lets the live path
    be compared row-for-row against the parquet dim on the same corpus."""
    table = {u: (c, e) for u, c, e in url_status_rows()}

    def fetch(url):
        return table.get(url, (None, "unknown_host"))

    return fetch


def test_live_dimension_matches_frozen(spark, images_dir):
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    live = live_url_status(
        images, fetch_one=_frozen_fetcher(), num_tasks=4
    ).collect()
    # exactly once per distinct URL
    assert len({r["url"] for r in live}) == len(live)
    frozen = {u: (c, e) for u, c, e in url_status_rows()}
    cited = {
        r["url"]
        for r in distinct_urls(images).collect()
    }
    assert {r["url"] for r in live} == cited
    for r in live:
        want_code, want_err = frozen.get(r["url"], (None, "unknown_host"))
        assert r["status_code"] == want_code, r["url"]
        assert r["error"] == want_err, r["url"]


def test_live_flags_equal_frozen_flags(spark, images_dir):
    """The pipeline's P013/P025 flags computed from the LIVE dimension
    equal the flags from the frozen parquet dimension: the tier-3 path
    is a drop-in behind the same interface."""
    images = spark.read.parquet(f"{images_dir}/images.parquet").limit(200)
    frozen_dim = spark.read.parquet(f"{images_dir}/url_status.parquet")
    live_dim = live_url_status(images, fetch_one=_frozen_fetcher())

    def flags(dim):
        udf = make_caption_stage_udf(spark, dim)
        out = images.select(
            "image_id", udf(F.col("caption")).alias("c")
        ).select("image_id", "c.P013", "c.P025")
        return {r["image_id"]: (r["P013"], r["P025"]) for r in out.collect()}

    assert flags(live_dim) == flags(frozen_dim)


def test_deterministic_fetcher_paths(spark):
    df = spark.createDataFrame(
        [
            (1, "see http://a.example/x and http://a.example/x again"),
            (2, "dup cite http://a.example/x plus www.b.example/page."),
            (3, "timeout case http://t.example/q7"),
            (4, "no urls here"),
            (5, None),
        ],
        "image_id long, caption string",
    )
    rows = live_url_status(
        df, fetch_one=deterministic_fetcher, num_tasks=2
    ).collect()
    got = {r["url"]: (r["status_code"], r["error"]) for r in rows}
    assert set(got) == {
        "http://a.example/x",
        "www.b.example/page",
        "http://t.example/q7",
    }
    assert got["http://t.example/q7"] == (None, "timeout")
    for u in ("http://a.example/x", "www.b.example/page"):
        code = _DET_CODES[sum(ord(c) for c in u) % len(_DET_CODES)]
        assert got[u] == (code, None)
