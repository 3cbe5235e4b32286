"""The simhash cross-engine contract (operators/dedup.py SIMHASH spec vs
the DuckDB recomputation embedded in __spark_entry__._simhash_pairs_sql)
pinned by a hypothesis sweep: the vectorized numpy signature and a DuckDB
list_reduce/unicode() recomputation must agree BIT-EXACTLY on arbitrary
text — including the 32-code-point truncation boundary, non-BMP
characters (UCS4 vs unicode() agreement), repeated tokens (majority-vote
ties), empty and null captions.

Whitespace is PINNED, not restricted: both engines tokenize on the
explicit ASCII class (dedup.ASCII_WS — the Java \\s set), so the sweep
deliberately feeds every class member as a separator AND Unicode
whitespace (NBSP) inside tokens, asserting NBSP is a non-separator in
both engines. The remaining domain note: tokens avoid locale-special
case folds (e.g. U+0130), where Python str.lower() and utf8proc lowering
genuinely differ.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from metacheck_spark.operators.dedup import _FNV, SIMHASH_MAXLEN, simhash_batch

# letters across scripts (incl. non-BMP math bold + emoji), digits, punct,
# and NBSP — Unicode whitespace that the pinned contract keeps IN-token
_TOKEN_CHARS = (
    "abcXYZ09_-#@éüñßσπ漢字語🙂𝕏\u00a0"  # noqa: RUF001  (ends with NBSP)
)
_token = st.text(alphabet=_TOKEN_CHARS, min_size=1, max_size=40)
# every member of the pinned ASCII_WS class appears as a separator
_sep = st.sampled_from([" ", "\t", "\n", "\x0b", "\f", "\r", "  ", " \t "])
_caption = st.builds(
    lambda toks, seps: "".join(t + s for t, s in zip(toks, seps)),
    st.lists(_token, min_size=0, max_size=12),
    st.lists(_sep, min_size=12, max_size=12),
)


def _sig_sql() -> str:
    (b1, p1), (b2, p2) = _FNV

    def lane(basis: int, prime: int) -> str:
        return (
            f"list_reduce(list_prepend({basis}::UBIGINT, "
            f"list_transform(split(substr(t,1,{SIMHASH_MAXLEN}),''), "
            f"c -> unicode(c)::UBIGINT)), "
            f"(a,b) -> ((xor(a,b) * {prime}) % 4294967296))"
        )

    bits = [
        f"CASE WHEN 2*sum((h1 >> {j}) & 1) > count(*) "
        f"THEN {1 << j}::UBIGINT ELSE 0::UBIGINT END"
        for j in range(32)
    ] + [
        f"CASE WHEN 2*sum((h2 >> {j}) & 1) > count(*) "
        f"THEN {1 << (32 + j)}::UBIGINT ELSE 0::UBIGINT END"
        for j in range(32)
    ]
    return f"""
WITH tok AS (
  SELECT i, unnest(list_filter(
           string_split_regex(lower(coalesce(text,'')), '[ \\t\\n\\x0b\\f\\r]+'),
           x -> x != '')) AS t
  FROM docs
), h AS (
  SELECT i, {lane(b1, p1)} AS h1, {lane(b2, p2)} AS h2 FROM tok
), sig AS (
  SELECT i, ({' + '.join(bits)}) AS s FROM h GROUP BY i
)
SELECT d.i, coalesce(sig.s, 0)::UBIGINT AS s
FROM docs d LEFT JOIN sig USING (i) ORDER BY d.i
"""


_SQL = _sig_sql()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(st.none(), _caption), min_size=1, max_size=8))
def test_numpy_and_duckdb_signatures_bit_equal(texts):
    ours = simhash_batch(pd.Series(texts, dtype="object")).tolist()
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"i": range(len(texts)), "text": texts})
    )
    theirs = [int(r[1]) for r in con.execute(_SQL).fetchall()]
    con.close()
    # numpy view is signed int64; DuckDB side is UBIGINT — compare mod 2^64
    assert [v & (2**64 - 1) for v in ours] == theirs


def test_truncation_boundary_explicit():
    """Tokens of 31/32/33 chars: the 33rd code point must not affect the hash."""
    a, b, c = "x" * 31, "x" * 32, "x" * 33
    sigs = simhash_batch(pd.Series([a, b, c])).tolist()
    assert sigs[1] == sigs[2] != sigs[0]
