"""Per-document parity vs the reference's OWN EXECUTED detectors over its
shipped 899-doc SoMEF corpus (PARITY.md): every one of the 27 rules must
agree on every document — exact flag equality, not count distance. The
reference detectors run in-process (pure Python) with HTTP frozen to the
fixtures url_status_map; a detector crash counts as not-fired, exactly as
detect_pitfalls_main.py:335-337 treats it. Skipped when the read-only
reference checkout is absent."""

import os
import sys

import pytest

CORPUS = "/root/reference/src/metacheck/somef_outputs"
TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present"
)

# the reference-execution counts at the frozen url_status_map — pinned so a
# silent harness regression (e.g. corpus read dropping docs) is caught even
# if both sides drift together
EXPECTED_COUNTS = {
    "P001": 344, "P002": 45, "W003": 159, "W004": 267, "P005": 17,
    "P006": 1, "P007": 7, "P008": 9, "W010": 591, "P011": 0, "W012": 17,
    "P013": 0, "W014": 90, "W015": 63, "P016": 15, "P017": 0, "P018": 0,
    "P019": 21, "P020": 168, "W021": 11, "P022": 175, "P023": 6,
    "P024": 55, "P025": 311, "P026": 176, "P027": 236, "P028": 5,
}


@pytest.fixture(scope="module")
def flag_tables(spark):
    sys.path.insert(0, TOOLS)
    from ref_exec_parity import reference_flags, spark_flags

    ref = reference_flags()
    ours = spark_flags()
    return ref, ours


def test_corpus_parses_fully(flag_tables):
    ref, ours = flag_tables
    assert len(ref) >= 890
    assert set(ref) == set(ours)


@pytest.mark.parametrize("code", sorted(EXPECTED_COUNTS))
def test_per_document_parity(flag_tables, code):
    ref, ours = flag_tables
    mismatched = [
        name
        for name in ref
        if ref[name].get(code, False) != ours[name].get(code, False)
    ]
    assert mismatched == [], f"{code}: {len(mismatched)} docs disagree"
    got = sum(1 for name in ref if ours[name].get(code, False))
    assert got == EXPECTED_COUNTS[code], f"{code}: count {got} drifted"
