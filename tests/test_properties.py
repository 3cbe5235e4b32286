"""Property-based tests (SURVEY.md §5.4) over the pure batch functions that
back both the Spark UDFs and the oracle — no SparkSession needed, so these
run in milliseconds and hammer edge cases pytest examples would miss."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from metacheck_spark.functions.langid import langid_batch
from metacheck_spark.functions.perplexity import ppl_batch
from metacheck_spark.functions.scrub import scrub_batch, scrub_one
from metacheck_spark.functions.urlcheck import extract_urls, url_flags_one

text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=200, deadline=None)
@given(text)
def test_scrub_batch_matches_scrub_one(s):
    assert scrub_batch(pd.Series([s]))[0] == scrub_one(s)


@settings(max_examples=200, deadline=None)
@given(text)
def test_scrub_is_idempotent(s):
    once = scrub_one(s)
    assert scrub_one(once) == once


@settings(max_examples=200, deadline=None)
@given(text)
def test_scrub_removes_all_emails(s):
    from metacheck_spark.functions.patterns import SCRUB_EMAIL
    import re

    assert re.search(SCRUB_EMAIL, scrub_one(s + " x@y.zz")) is None


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from("photo fox river montaña renard fluss".split()), max_size=20))
def test_langid_is_order_invariant(words):
    a = " ".join(words)
    b = " ".join(reversed(words))
    la, ca = langid_batch(pd.Series([a]))
    lb, cb = langid_batch(pd.Series([b]))
    assert la[0] == lb[0] and ca[0] == cb[0]


@settings(max_examples=150, deadline=None)
@given(text)
def test_langid_never_crashes_and_conf_bounded(s):
    lang, conf = langid_batch(pd.Series([s, None]))
    assert 0.0 <= conf[0] <= 1.0
    assert isinstance(lang[0], str)


@settings(max_examples=150, deadline=None)
@given(text)
def test_ppl_finite_and_nonnegative(s):
    v = float(ppl_batch(pd.Series([s]))[0])
    assert v >= 0.0 and v == v  # non-negative, not NaN
    # add-1 smoothing bounds log P below log(256*count); generous cap:
    assert v < 20.0


@settings(max_examples=150, deadline=None)
@given(text, st.sampled_from(["", ".", ",,", ")]"]))
def test_url_extraction_strips_trailing_punct(s, tail):
    urls = extract_urls(s + " https://ex.org/a" + tail)
    assert "https://ex.org/a" in urls
    assert all(not u.endswith((".", ",", ")", "]")) for u in urls)


@settings(max_examples=150, deadline=None)
@given(text)
def test_unknown_urls_abstain(s):
    # empty status map => no rule can fire regardless of caption content
    assert url_flags_one(s, {}) == (False, False)


@settings(max_examples=100, deadline=None)
@given(st.integers(200, 299))
def test_2xx_always_accessible(code):
    u = "https://ex.org/a"
    assert url_flags_one(f"see {u}", {u: code}) == (False, False)


def test_301_quirk_pair():
    """P013 accepts 301, P025 rejects it (reference p013.py:47 vs
    p025.py:40-41)."""
    u = "https://ex.org/a"
    assert url_flags_one(f"see {u}", {u: 301}) == (False, True)
    assert url_flags_one(f"see {u}", {u: 404}) == (True, True)
