"""bench.py self-adjudication contract (round-4 top ask): a query whose
min-of-3 lands above its clean-run band is automatically re-run, the
reported value is the min over ALL observations, and only a query that
stays out of band through every retry round is flagged noisy — so a
single host-stall epoch can no longer poison the official BENCH artifact
silently (it happened in r02 events_json and r03 quality_pipeline).

The timing source is scripted (no Spark): the contract under test is the
retry/flagging logic, not the queries.
"""

from __future__ import annotations

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")
bench = importlib.import_module("bench")


@pytest.fixture()
def rigged(monkeypatch):
    """Patch bench's timing source with a scripted duration sequence and
    force bands on with a known band."""
    script: list[float] = []
    monkeypatch.setattr(bench, "timed", lambda fn, spark=None: script.pop(0))
    monkeypatch.setattr(bench, "bands_active", lambda: True)
    monkeypatch.setattr(bench, "BANDS", {"q": (0.5, 2.0)})
    monkeypatch.setattr(bench, "RETRY_ROUNDS", 2)
    monkeypatch.setattr(bench, "RETRY_COOLDOWN", 0.0)
    return script


def test_in_band_first_round_no_retry(rigged):
    rigged.extend([1.5, 1.2, 1.4])
    sec, obs, noisy = bench.adjudicate("q", lambda: None, None)
    assert (sec, noisy) == (1.2, False)
    assert obs == [1.5, 1.2, 1.4]  # exactly one round ran


def test_stall_epoch_recovers_on_retry(rigged):
    # round 1 entirely stalled (the r03 quality_pipeline failure mode),
    # round 2 clean -> value is the clean min, not flagged
    rigged.extend([16.3, 15.1, 17.0, 1.4, 1.6, 1.5])
    sec, obs, noisy = bench.adjudicate("q", lambda: None, None)
    assert (sec, noisy) == (1.4, False)
    assert len(obs) == 6


def test_persistent_stall_is_flagged_not_silent(rigged):
    rigged.extend([16.0] * 9)  # 1 + RETRY_ROUNDS rounds, all stalled
    sec, obs, noisy = bench.adjudicate("q", lambda: None, None)
    assert noisy is True
    assert sec == 16.0
    assert len(obs) == 9  # every observation preserved for the artifact


def test_below_band_is_improvement_never_retried(rigged):
    rigged.extend([0.1, 0.1, 0.1])
    sec, obs, noisy = bench.adjudicate("q", lambda: None, None)
    assert (sec, noisy, len(obs)) == (0.1, False, 3)


def test_unknown_query_or_inactive_bands_skip_adjudication(rigged, monkeypatch):
    rigged.extend([99.0, 99.0, 99.0])
    sec, obs, noisy = bench.adjudicate("unbanded", lambda: None, None)
    assert (sec, noisy, len(obs)) == (99.0, False, 3)
    monkeypatch.setattr(bench, "bands_active", lambda: False)
    rigged.extend([99.0, 99.0, 99.0])
    sec, obs, noisy = bench.adjudicate("q", lambda: None, None)
    assert (sec, noisy, len(obs)) == (99.0, False, 3)


def test_bands_cover_every_battery_query():
    """The battery and the band table must not drift apart: every headline
    query bench.py times has a machine-readable band."""
    src = open("/root/repo/bench.py").read()
    import re

    battery_keys = set(re.findall(r'^        "([a-z_]+)": lambda', src, re.M))
    assert battery_keys, "battery parse failed"
    missing = battery_keys - set(bench.BANDS)
    assert not missing, f"battery queries without a band: {missing}"
    assert "quality_pipeline" in bench.BANDS
