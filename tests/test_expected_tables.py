"""Drift guard for the frozen binary-codec oracles (round-5 ask #1).

The five expected-output parquet tables under
metacheck_spark/fixtures/expected/ are what oracle_sql() compares the
Spark binary-codec queries against. They must stay exactly what
tools/gen_expected.py derives — if a codec, fixture generator, or rule
changes, the committed tables must be regenerated in the same commit,
otherwise the driver gate would be comparing against stale expectations.

Regeneration is a pure function of the row index (PCG64 seeds, fixed
parquet writer settings), so byte-identity is the right assertion."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import gen_expected  # noqa: E402

NAMES = sorted(gen_expected.BUILDERS)


def test_committed_expected_tables_match_regeneration(tmp_path):
    out = str(tmp_path / "expected")
    gen_expected.write_expected(out)
    for name in NAMES:
        fresh = open(os.path.join(out, f"{name}.parquet"), "rb").read()
        committed_path = os.path.join(gen_expected.EXPECTED_DIR, f"{name}.parquet")
        assert os.path.exists(committed_path), (
            f"{name}: committed expected table missing — run tools/gen_expected.py"
        )
        committed = open(committed_path, "rb").read()
        assert fresh == committed, (
            f"{name}: committed expected table is stale — regenerate with "
            "tools/gen_expected.py and commit alongside the change"
        )


@pytest.mark.parametrize("name", NAMES)
def test_expected_tables_are_nonempty_and_typed(name):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(gen_expected.EXPECTED_DIR, f"{name}.parquet"))
    assert t.num_rows > 0
    assert [f.name for f in t.schema] == list(gen_expected.TYPES[name])
