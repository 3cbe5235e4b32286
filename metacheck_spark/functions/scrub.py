"""PII / toxicity scrub — compiled Python `re` over pandas Series batches
(Series.str.replace is a C-loop over the batch; no per-row Spark UDF).

Python `re` (not Java rlike/regexp_replace) is REQUIRED here: the scrubbed
caption must match the reference labels byte-for-byte (SURVEY.md §4.3) and
Java/Python regex dialects diverge on corner cases (lookbehind semantics,
\\w unicode classes). The same batch function backs the Spark pandas UDF
and the oracle, so equality is exact by construction.

Order is semantic and fixed: email -> phone -> toxicity.
"""

from __future__ import annotations

import re

import pandas as pd

from metacheck_spark.functions import patterns as P

_EMAIL = re.compile(P.SCRUB_EMAIL)
_PHONE = re.compile(P.SCRUB_PHONE)
_TOXIC = re.compile(P.SCRUB_TOXIC)

EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
TOXIC_TOKEN = "[REDACTED]"


def scrub_batch(captions: pd.Series) -> pd.Series:
    """Scrubbed captions; nulls pass through as nulls."""
    mask = captions.notna()
    out = captions.copy()
    s = captions[mask]
    s = s.str.replace(_EMAIL, EMAIL_TOKEN, regex=True)
    s = s.str.replace(_PHONE, PHONE_TOKEN, regex=True)
    s = s.str.replace(_TOXIC, TOXIC_TOKEN, regex=True)
    out[mask] = s
    return out


def scrub_one(caption: str | None) -> str | None:
    """Oracle-side single-row scrub — same compiled patterns, same order."""
    if caption is None:
        return None
    s = _EMAIL.sub(EMAIL_TOKEN, caption)
    s = _PHONE.sub(PHONE_TOKEN, s)
    return _TOXIC.sub(TOXIC_TOKEN, s)
