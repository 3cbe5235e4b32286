"""Text-analysis functions for training-data pipelines: token counting,
quality scoring, BPE-ish subword counting — all native Column expressions
(languages-ID lives in functions/langid.py, fingerprinting in
operators/dedup.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small multilingual stopword sample — enough for ratio features.
STOPWORDS = [
    "the", "a", "of", "in", "and", "to", "is", "for", "with", "on",
    "el", "la", "de", "en", "y", "le", "et", "der", "die", "und",
]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
# (the standard public pre-tokenization shape used by byte-pair encoders).
BPE_ISH = r"[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-zÀ-ɏ0-9]"


def token_count(c: Column) -> Column:
    """Whitespace token count; 0 for blank/null."""
    t = F.trim(F.coalesce(c, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_count(c: Column) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenization regex."""
    return F.size(F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(BPE_ISH), 0))


def punct_ratio(c: Column) -> Column:
    s = F.coalesce(c, F.lit(""))
    n_punct = F.length(s) - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    return F.when(F.length(s) > 0, n_punct / F.length(s)).otherwise(F.lit(0.0))


def digit_ratio(c: Column) -> Column:
    s = F.coalesce(c, F.lit(""))
    n_digit = F.length(s) - F.length(F.regexp_replace(s, r"[0-9]", ""))
    return F.when(F.length(s) > 0, n_digit / F.length(s)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column) -> Column:
    toks = F.split(F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct/digit
    noise. Deterministic, engine-portable arithmetic (used by the
    oracle-checked q_text_quality query)."""
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 200), F.lit(1.0)).otherwise(F.lit(0.4))
    noise = punct_ratio(c) + digit_ratio(c)
    return F.round(len_ok * (1.0 - F.least(noise, F.lit(1.0))), 6)
