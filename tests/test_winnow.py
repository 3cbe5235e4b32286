"""Winnowing (rolling-hash document fingerprinting, operators/dedup.py
winnow_batch / winnow_fingerprints / winnow_overlap_pairs): the kernel is
pinned three ways — against a transliterated pure-Python implementation
of the winnowing scheme, against the DuckDB recomputation the driver
oracle uses (__spark_entry__._winnow_fp_sql contract, hypothesis sweep),
and end-to-end through Spark including the bucket-expanded overlap
counts vs a brute-force pair count.

Shared cross-engine domain (same note as test_simhash_cross_engine):
ASCII whitespace separators, characters whose lower()/codepoint
semantics agree between Python, Spark, and DuckDB — the sweep alphabet
includes non-BMP codepoints to pin the utf-32 view against unicode().
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from metacheck_spark.operators.dedup import (
    _FNV,
    WINNOW_K,
    WINNOW_W,
    winnow_batch,
    winnow_fingerprints,
    winnow_overlap_pairs,
)

SF = "/root/testdata/sf0.001"


def py_winnow(text: str | None, k: int = WINNOW_K, w: int = WINNOW_W) -> set:
    """Transliteration of the winnowing paper's scheme with the repo's
    FNV k-gram hash — deliberately scalar/naive."""
    if text is None:
        return set()
    t = re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < k:
        return set()
    basis, prime = _FNV[0]
    hs = []
    for i in range(len(t) - k + 1):
        h = basis
        for ch in t[i : i + k]:
            h = ((h ^ ord(ch)) * prime) % 4294967296
        hs.append(h)
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[p : p + w]) for p in range(len(hs) - w + 1)}


CASES = [
    "The quick brown fox  jumps over the lazy dog",
    "the QUICK brown fox jumps over the lazy dog",  # same normalized form
    "completely different content about spark engines",
    "tiny",  # < k: no k-grams
    "1234567",  # k-1 chars exactly
    "12345678",  # exactly one k-gram
    "exactly8!",  # 2 k-grams < w: degenerate window
    "abcdefghij",  # k-grams == 3 < w
    "abcdefghijk",  # k-grams == w: first full window
    "",
    None,
    "  WeiRD   Spacing\tcase\n\nhere  ",
    "aaaaaaaaaaaaaaaaaaaaaa",  # constant text: 1 fingerprint
]


def test_kernel_matches_python_reference():
    got = winnow_batch(pd.Series(CASES, dtype=object))
    for text, fps in zip(CASES, got):
        assert set(fps) == py_winnow(text), text
    # same normalized text => identical fingerprint set
    assert set(got[0]) == set(got[1])


def test_winnowing_guarantee_shared_substring():
    """Any shared substring of length >= k + w - 1 yields at least one
    shared fingerprint — the scheme's detection guarantee."""
    shared = "x" * 0 + "the common stolen passage survives winnowing"
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    a = f"prefix words here {shared} and an ending"
    b = f"totally other opening {shared} different tail"
    got = winnow_batch(pd.Series([a, b], dtype=object))
    assert set(got[0]) & set(got[1])


def _winnow_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """The driver oracle's CTE chain, parameterized over a `docs(i, text)`
    table (mirrors __spark_entry__._winnow_cte)."""
    basis, prime = _FNV[0]
    return f"""
WITH norm AS (
  SELECT i,
         trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ') AS t
  FROM docs
),
g AS (SELECT i, t, length(t) AS n FROM norm WHERE length(t) >= {k}),
kh AS (
  SELECT i,
    list_transform(range(1, n - {k} + 2), x ->
      list_reduce(
        list_prepend({basis}::UBIGINT,
          list_transform(range(x, x + {k}), j -> unicode(t[j])::UBIGINT)),
        (a, b) -> ((xor(a, b) * {prime}) % 4294967296))) AS hs
  FROM g
),
win AS (
  SELECT i,
    CASE WHEN len(hs) >= {w} THEN
      list_distinct(list_transform(range(1, len(hs) - {w} + 2), p ->
        list_min(list_transform(range(p, p + {w}), q -> hs[q]))))
    ELSE [list_min(hs)] END AS fps
  FROM kh
)
SELECT i, unnest(fps)::BIGINT AS fp FROM win
"""


# NBSP included: Unicode whitespace the pinned ASCII_WS contract keeps
# IN the normalized text on both engines (it is not a separator)
_TOKEN_CHARS = "abcXYZ09_-#@éüñßσπ漢字語🙂𝕏\u00a0"  # noqa: RUF001  (ends with NBSP)
_token = st.text(alphabet=_TOKEN_CHARS, min_size=1, max_size=12)
# separators cover every member of the pinned ASCII_WS class
_sep = st.sampled_from([" ", "\t", "\n", "\x0b", "\f", "\r", "  ", " \t "])
_text = st.builds(
    lambda toks, seps: "".join(t + s for t, s in zip(toks, seps)),
    st.lists(_token, min_size=0, max_size=8),
    st.lists(_sep, min_size=8, max_size=8),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_text, min_size=1, max_size=6))
# regression: leading NBSP — DuckDB's default trim() strips Unicode
# spaces while Python strip(' ')/Spark trim are space-only; every oracle
# trim is pinned to trim(x, ' ')
@example(texts=["", "", "\xa0000 0 0 "])
def test_cross_engine_contract(texts):
    got = winnow_batch(pd.Series(texts, dtype=object))
    spark_side = {i: set(fps) for i, fps in enumerate(got)}
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(i BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", list(enumerate(texts))
    )
    duck_side: dict = {i: set() for i in range(len(texts))}
    for i, fp in con.execute(_winnow_sql()).fetchall():
        duck_side[i].add(fp)
    con.close()
    assert spark_side == duck_side


@pytest.fixture(scope="module")
def docs(spark):
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    from pyspark.sql import functions as F

    variants = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    return d.unionAll(variants).cache()


def test_operator_matches_kernel(spark, docs):
    rows = docs.collect()
    expected = set()
    for r in rows:
        for fp in py_winnow(r.text):
            expected.add((r.doc_id, fp))
    got = {
        (r.id, r.fp)
        for r in winnow_fingerprints(docs, "text", "doc_id").collect()
    }
    assert got == expected


def test_overlap_pairs_match_bruteforce(spark, docs):
    rows = docs.collect()
    fps = {r.doc_id: py_winnow(r.text) for r in rows}
    ids = sorted(fps)
    brute = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            n = len(fps[a] & fps[b])
            if n >= 2:
                brute[(a, b)] = n
    got = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_overlap_pairs(
            docs, "text", "doc_id", min_shared=2
        ).collect()
    }
    assert got == brute
    # the seeded near-dup variants must surface with high overlap
    seeded = [p for p in got if p[1] == p[0] + 100000]
    assert seeded
    assert all(got[p] >= 5 for p in seeded)


def test_star_routing_oversized_fingerprint_bucket(spark):
    """A fingerprint shared by more docs than max_bucket star-routes
    around the min-id hub: O(bucket) pairs, cluster stays connected."""
    boiler = "shared boilerplate disclaimer text appears everywhere here"
    rows = [(i, boiler) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = winnow_overlap_pairs(
        df, "text", "doc_id", min_shared=1, max_bucket=5
    ).collect()
    pair_set = {(r.id_a, r.id_b) for r in got}
    # every doc connects to the hub (doc 0)
    assert pair_set == {(0, i) for i in range(1, 12)}
    n_fps = len(py_winnow(boiler))
    assert all(r.shared_fps == n_fps for r in got)


def test_gate_corpus_buckets_under_cap(spark):
    """The driver oracle equality (winnow_pairs vs DuckDB brute join)
    holds iff no fingerprint bucket exceeds max_bucket on the gate
    corpus — pin that premise."""
    import __spark_entry__ as E

    fps = E.q_winnow_fp(spark, SF)
    from pyspark.sql import functions as F

    mx = fps.groupBy("fp").count().agg(F.max("count")).collect()[0][0]
    assert mx is not None and mx <= 1000


def test_max_doc_freq_drops_boilerplate_keeps_rare(spark):
    """The MOSS-style doc-frequency cutoff: fingerprints appearing in
    more than max_doc_freq docs stop contributing to shared counts,
    while pairs connected by RARE fingerprints are untouched."""
    boiler = "every document repeats this exact boilerplate banner text"
    rows = [(i, f"{boiler} unique tail number {i}") for i in range(8)]
    # two docs sharing a rare passage on top of the boilerplate
    rare = "the rare shared passage that only two documents contain"
    rows += [(100, f"{boiler} {rare} alpha"), (101, f"{boiler} {rare} beta")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    full = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_overlap_pairs(df, "text", "doc_id", min_shared=1).collect()
    }
    cut = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_overlap_pairs(
            df, "text", "doc_id", min_shared=1, max_doc_freq=5
        ).collect()
    }
    # boilerplate fps appear in all 10 docs -> dropped by the cutoff;
    # the (100, 101) pair survives via its rare-passage fingerprints
    assert (100, 101) in cut
    rare_only = set(py_winnow(rows[-2][1])) & set(py_winnow(rows[-1][1]))
    common_to_all = set.intersection(*[py_winnow(t) for _, t in rows])
    assert cut[(100, 101)] == len(rare_only - common_to_all)
    assert full[(100, 101)] > cut[(100, 101)]
    # pure-boilerplate pairs disappear entirely under the cutoff
    assert (0, 1) in full and (0, 1) not in cut
