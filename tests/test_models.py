"""Model-stage unit tests: langid, perplexity separation, scrub exactness."""

import numpy as np
import pandas as pd

from metacheck_spark.functions.langid import LANGS, LEXICONS, langid_batch
from metacheck_spark.functions.perplexity import PPL_THRESHOLD, ppl_batch
from metacheck_spark.functions.scrub import scrub_batch, scrub_one


def test_langid_identifies_every_language():
    caps = pd.Series([" ".join(LEXICONS[lang][:8]) for lang in LANGS])
    langs, confs = langid_batch(caps)
    assert list(langs) == LANGS
    assert (confs == 1.0).all()


def test_langid_unknown_cases():
    caps = pd.Series(
        [
            "",                              # empty
            None,                            # null
            "qqq zzz xxx",                   # no lexicon words
            " ".join(LEXICONS["en"][:2] + LEXICONS["es"][:2] + LEXICONS["fr"][:2]),
        ]
    )
    langs, _ = langid_batch(caps)
    assert list(langs) == ["und", "und", "und", "und"]


def test_langid_majority_wins():
    caps = pd.Series([" ".join(LEXICONS["de"][:6]) + " " + LEXICONS["en"][0]])
    langs, confs = langid_batch(caps)
    assert langs.iloc[0] == "de"
    assert 0.5 <= confs.iloc[0] < 1.0


def test_ppl_separates_gibberish():
    normal = pd.Series([" ".join(LEXICONS[lang][:10]) for lang in LANGS])
    gib = pd.Series(["zqxwjkvzqxwjkvzqxwjkvzqxwjkvzqxwjkv"])
    assert (ppl_batch(normal) < PPL_THRESHOLD).all()
    assert (ppl_batch(gib) > PPL_THRESHOLD).all()


def test_ppl_short_strings_neutral():
    assert (ppl_batch(pd.Series(["", None, "a"])) == 0.0).all()


def test_ppl_batch_equals_single_row():
    """reduceat batching must give bit-identical scores to 1-row batches —
    this is what makes Spark-vs-oracle ppl parity exact."""
    caps = ["photo of a fox", "zqxw", "updated: 2024-01-01", "a", ""]
    batch = ppl_batch(pd.Series(caps)).to_numpy()
    singles = np.array([float(ppl_batch(pd.Series([c])).iloc[0]) for c in caps])
    assert (batch == singles).all()


def test_scrub_email_phone_toxic():
    s = pd.Series(
        [
            "contact alice@example.com now",
            "call 555-123-4567 today",
            "what the frak is this",
            "clean caption",
            None,
        ]
    )
    out = scrub_batch(s)
    assert out.iloc[0] == "contact [EMAIL] now"
    assert out.iloc[1] == "call [PHONE] today"
    assert out.iloc[2] == "what the [REDACTED] is this"
    assert out.iloc[3] == "clean caption"
    assert out.iloc[4] is None


def test_scrub_one_matches_batch():
    cases = [
        "a@b.co and c@d.org",
        "(555) 123-4567 or 555 123 4567",
        "frak FRAK Frak",
        "id 12345-678-9012 not a phone? 555-123-45678",
    ]
    batch = scrub_batch(pd.Series(cases))
    for i, c in enumerate(cases):
        assert scrub_one(c) == batch.iloc[i]
