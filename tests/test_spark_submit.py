"""End-to-end `spark-submit --py-files` test — the north_rule's literal
deployment surface ("resumable from checkpoint ... run via spark-submit
--py-files"). Each case launches a REAL spark-submit subprocess against
the packaged dist/metacheck_spark.zip (no repo on the worker path beyond
the zip + tools/run_job.py), then verifies the written audit/kept tables
with DuckDB (an independent reader) against the pure-Python label oracle.

Crash-point coverage for the resume contract:

* clean run            — full oracle match, summary counts exact
* die mid bucket-commit — some audit bucket dirs missing, no kept output;
                          rerun processes ONLY the missing buckets and
                          backfills kept for everything
* die between audit commit and kept write — the ledger says all buckets
                          done, so a naive rerun would skip the kept rows
                          forever; reconcile_kept must backfill them
* idempotent rerun      — a rerun over a fully-converged state appends
                          nothing (exactly-once held)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb
import pytest

from metacheck_spark.fixtures.gen_images import (
    gen_rows,
    url_status_map,
    write_images_parquet,
)
from metacheck_spark.fixtures.oracle import label_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")
N = 600
RUN_TS = "2026-01-01T00:00:00Z"

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


@pytest.fixture(scope="module")
def golden():
    return {l["image_id"]: l for l in label_rows(gen_rows(N), url_status_map())}


@pytest.fixture(scope="module")
def job_env(tmp_path_factory):
    """Fresh zip + images fixture, shared by the module's submits."""
    root = tmp_path_factory.mktemp("submit")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    images = str(root / "images")
    write_images_parquet(images, N)
    return {"zip": zip_path, "images": images, "root": root}


def _submit(job_env, audit: str, kept: str, summary: str | None = None):
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", job_env["zip"],
        os.path.join(REPO, "tools", "run_job.py"),
        "--images", f"{job_env['images']}/images.parquet",
        "--url-status", f"{job_env['images']}/url_status.parquet",
        "--audit", audit, "--kept", kept,
        "--buckets", "8", "--salt", "4", "--run-ts", RUN_TS,
    ]
    if summary:
        cmd += ["--summary", summary]
    # strip the repo from the child's import path: the zip must be the
    # sole provider of metacheck_spark on the executors AND the driver
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/", env=env)
    assert r.returncode == 0, f"spark-submit failed:\n{r.stderr[-4000:]}"
    return r.stdout


def _read_audit(path: str) -> dict[str, dict]:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT image_id, rule_hits, keep, scrubbed_caption, bucket, run_ts "
        f"FROM read_parquet('{path}/bucket=*/*.parquet', hive_partitioning=1)"
    ).fetchall()
    con.close()
    return {r[0]: r for r in rows}


def _read_kept(path: str) -> dict[str, tuple]:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT image_id, lang, scrubbed_caption "
        f"FROM read_parquet('{path}/lang=*/*.parquet', hive_partitioning=1)"
    ).fetchall()
    con.close()
    assert len({r[0] for r in rows}) == len(rows), "duplicate kept rows"
    return {r[0]: r for r in rows}


def _assert_converged(golden, audit_path: str, kept_path: str):
    audit = _read_audit(audit_path)
    assert set(audit) == set(golden)
    for i, g in golden.items():
        got = audit[i]
        assert list(got[1]) == g["rule_hits"], i
        assert got[2] == g["keep"], i
        assert got[3] == g["scrubbed_caption"], i
        assert got[5] == RUN_TS
    kept = _read_kept(kept_path)
    assert set(kept) == {i for i, g in golden.items() if g["keep"]}
    for i, row in kept.items():
        assert row[1] == golden[i]["lang"], i
        assert row[2] == golden[i]["scrubbed_caption"], i


def test_clean_run_and_all_crash_points(job_env, golden, tmp_path):
    import json

    audit = str(tmp_path / "audit")
    kept = str(tmp_path / "kept")
    summary = str(tmp_path / "summary.json")

    # --- clean run ---
    out = _submit(job_env, audit, kept, summary)
    assert "[resume]" not in out
    _assert_converged(golden, audit, kept)
    s = json.load(open(summary))["summary"]
    assert s["total_rows"] == N
    assert s["kept_rows"] == sum(1 for g in golden.values() if g["keep"])

    # --- crash mid bucket-commit: 3 of 8 audit buckets lost, kept never
    # written. The rerun must resume from the 5 committed buckets and
    # backfill kept completely. ---
    audit2 = str(tmp_path / "audit2")
    kept2 = str(tmp_path / "kept2")
    shutil.copytree(audit, audit2)
    for b in (5, 6, 7):
        shutil.rmtree(os.path.join(audit2, f"bucket={b}"))
    out = _submit(job_env, audit2, kept2)
    assert "[resume] 5 buckets already committed" in out
    _assert_converged(golden, audit2, kept2)

    # --- crash between audit commit and kept write: ledger complete,
    # kept absent — the previously-unrecoverable point. ---
    audit3 = str(tmp_path / "audit3")
    kept3 = str(tmp_path / "kept3")
    shutil.copytree(audit, audit3)
    out = _submit(job_env, audit3, kept3)
    assert "[resume] 8 buckets already committed" in out
    n_keep = sum(1 for g in golden.values() if g["keep"])
    assert f"[kept] reconciled {n_keep} rows" in out
    _assert_converged(golden, audit3, kept3)

    # --- idempotent rerun over converged state: nothing appended ---
    out = _submit(job_env, audit3, kept3)
    assert "[kept] reconciled 0 rows" in out
    _assert_converged(golden, audit3, kept3)
