"""Character-bigram language-model scorer (KenLM-style in spirit: an
n-gram LM with add-1 smoothing over bytes), fully vectorized with numpy —
a single concatenated byte buffer per Arrow batch, per-string segment
means via reduceat. No per-row Python in the hot path.

Deterministic: the model is trained at import time on the shipped langid
lexicons (the package IS the weights — distributed via --py-files). The
same batch function backs the Spark pandas UDF and the oracle.

Score = negative mean log P(b2 | b1) over adjacent utf-8 byte pairs of the
lowercased caption (i.e. log-perplexity). Higher = less language-like.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from metacheck_spark.functions.langid import LEXICONS

# --- train the bigram table deterministically -----------------------------
# Corpus = the langid lexicons + representative metadata-snippet text, so
# legitimate captions carrying URLs / dates / version strings / identifiers
# stay in-distribution and only genuinely alien character sequences score
# high. All constants — the package is the model.
TRAIN_EXTRA = (
    "updated: 2024-01-02 modified: mar 5, 2024 requires numpy >= 1.4 "
    "written in python 3.11 deps: numpy pandas scipy tags [red, fox] "
    "see https://img0.example.org/p0 ref https://moved1.example.org/p1 "
    "docs at https://proj.readthedocs.io/en/latest archived at "
    "https://zenodo.org/record/123 id: mytool see https://doi.org/10.9999/xyz "
    "compare v2.0.1 with 2.0.2 licensed under gpl-3.0 copyright 2020 "
    "by alice and bob clone example.com:user/repo.git terms in ./license.md "
    "contact user12@example.com call 555-123-4567 template <year> included "
    "swh:1:rev:0123456789abcdef0123456789abcdef01234567 doi:10.1234/abc123 "
    "https://www.photosite.com/gallery https://gone3.example.org/p3 "
    "please cite https://papers.example.org/p1 odd spacing line break "
)
_train = (
    " ".join(" ".join(ws) for ws in LEXICONS.values()) + " " + TRAIN_EXTRA
).lower().encode("utf-8")
_counts = np.ones((256, 256), dtype=np.float64)  # add-1 smoothing
_tb = np.frombuffer(_train, dtype=np.uint8)
np.add.at(_counts, (_tb[:-1], _tb[1:]), 1.0)
LOGP = np.log(_counts / _counts.sum(axis=1, keepdims=True))

# Captions scoring above this are dropped by rule X003 (engine extension).
# Chosen from the empirical separation between lexicon captions (~2.5-4.5)
# and gibberish (>5.5) — see tests/test_models.py.
PPL_THRESHOLD = 5.0
# Score assigned to captions shorter than one byte pair (null/empty/1-char):
# neutral, never trips X003 (such rows are handled by W015/X002).
SHORT_SCORE = 0.0


def ppl_batch(captions: pd.Series) -> pd.Series:
    """Vectorized log-perplexity per caption."""
    encoded = captions.fillna("").str.lower().str.encode("utf-8")
    lens = encoded.str.len().to_numpy(dtype=np.int64)
    out = np.full(len(encoded), SHORT_SCORE, dtype=np.float64)
    long_mask = lens >= 2
    if long_mask.any():
        bufs = encoded.to_numpy(dtype=object)[long_mask]
        llens = lens[long_mask]
        cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        ends = np.cumsum(llens)
        starts = ends - llens
        # valid bigram positions: all i where i and i+1 fall in one string
        valid = np.ones(len(cat) - 1, dtype=bool)
        valid[ends[:-1] - 1] = False  # pairs straddling string boundaries
        logp = np.where(valid, LOGP[cat[:-1], cat[1:]], 0.0)
        sums = np.add.reduceat(logp, starts)
        # reduceat over [start_i, start_{i+1}) includes the straddle zero
        out[long_mask] = -sums / (llens - 1)
    return pd.Series(out, index=captions.index)
