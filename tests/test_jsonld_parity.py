"""JSON-LD assessment-document + corpus-summary parity vs the reference's
OWN EXECUTED generator over its shipped 899-doc corpus: every produced
document must deep-equal create_pitfall_jsonld's output (modulo the
utcnow dateCreated, pinned on both sides), and corpus_summary must equal
the analysis_results.json detect_all_pitfalls writes. Skipped when the
read-only reference checkout is absent."""

import os
import sys

import pytest

CORPUS = "/root/reference/src/metacheck/somef_outputs"
TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def harness(spark):
    sys.path.insert(0, TOOLS)
    import ref_jsonld_parity as H

    return H


def test_document_parity(harness):
    ref = harness.reference_docs()
    ours = harness.spark_docs()
    assert len(ref) >= 800
    assert set(ref) == set(ours)
    bad = {
        name: list(harness._diff(ref[name], ours[name]))
        for name in ref
        if list(harness._diff(ref[name], ours[name]))
    }
    assert bad == {}, f"{len(bad)} documents diverge: {list(bad)[:3]}"


def test_summary_parity(harness):
    ref = harness.reference_summary()
    ours = harness.spark_summary()
    diffs = list(harness._diff(ref, ours))
    assert diffs == [], diffs[:10]
