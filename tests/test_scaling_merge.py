"""The scaling artifacts use a min-over-invocations protocol (single
invocations on this host swing up to ~2.7x between noise epochs — see
BASELINE.md's noise register). These tests pin the fold semantics of
tools/run_scaling_dedup.py so a re-run can only sharpen the artifact,
never let one noisy invocation clobber a clean recorded leg."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from run_scaling_dedup import fold_leg  # noqa: E402


def _leg(sec, **extra):
    return {"cpus": 8, "copies": 128, "rows": 667826, "sec": sec,
            "rows_per_sec": round(667826 / sec, 1), **extra}


def test_first_invocation_starts_history():
    best, hist = fold_leg({}, "cores_axis", "high", _leg(72.3))
    assert best["sec"] == 72.3
    assert hist == [72.3]


def test_noisy_rerun_keeps_recorded_minimum():
    prior = {"cores_axis": {"high": _leg(56.4, jvm_cpu_sec=361.8),
                            "invocations_sec": {"high": [56.4, 72.3]}}}
    best, hist = fold_leg(prior, "cores_axis", "high", _leg(105.5))
    assert best["sec"] == 56.4
    # every per-leg field travels with the winning leg, not mix-and-match
    assert best["jvm_cpu_sec"] == 361.8
    assert hist == [56.4, 72.3, 105.5]


def test_cleaner_rerun_replaces_whole_leg():
    prior = {"cores_axis": {"high": _leg(72.3, jvm_cpu_sec=434.8),
                            "invocations_sec": {"high": [72.3]}}}
    new = _leg(56.4, jvm_cpu_sec=361.8)
    best, hist = fold_leg(prior, "cores_axis", "high", new)
    assert best is new
    assert hist == [56.4, 72.3]


def test_axes_and_keys_are_independent():
    prior = {"cores_axis": {"low": _leg(205.6),
                            "invocations_sec": {"low": [205.6]}}}
    best, hist = fold_leg(prior, "input_axis", "x1", _leg(13.6))
    assert best["sec"] == 13.6
    assert hist == [13.6]


def test_changed_workload_resets_history():
    """A leg measured over a different corpus size must not min-compare
    against the recorded one — different work, different wall-clock."""
    prior = {"cores_axis": {"high": _leg(56.4),
                            "invocations_sec": {"high": [56.4, 72.3]}}}
    bigger = dict(_leg(150.0), copies=256, rows=1335652)
    best, hist = fold_leg(prior, "cores_axis", "high", bigger)
    assert best is bigger
    assert hist == [150.0]
