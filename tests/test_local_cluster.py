"""REAL executor-boundary gate (round-4 verdict ask #2): everything else
in the repo runs local[N] / spark-submit --master local[4], where
broadcasts, task closures, and Python workers never cross a process or
serialization boundary. `local-cluster[2,4,4096]` launches two separate
Worker JVMs (real executor processes): broadcasts are genuinely
serialized and shipped, closures pickled across processes, and the
--py-files zip is the ONLY way code reaches the executors — the closest
a single sandbox gets to a multi-executor cluster.

Two jobs cross the boundary, both verified by DuckDB (an independent
reader) against independent oracles:
* the full 8-stage quality-filter pipeline (tools/run_job.py) vs the
  pure-Python label oracle — keep/drop, rule_hits, scrubbed captions,
  exactly-once kept output;
* the shuffle-heavy dedup chain (tools/run_dedup_job.py: MinHash-LSH ->
  exact-Jaccard verify -> iterative connected components with per-round
  localCheckpoints) vs a DuckDB recursive-CTE transitive closure.
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
MASTER = "local-cluster[2,4,4096]"  # 2 worker JVMs x 4 cores x 4096 MB
N = 600
RUN_TS = "2026-02-02T00:00:00Z"
SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


@pytest.fixture(scope="module")
def zip_path():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    )
    return out.stdout.strip().splitlines()[-1]


def _submit(zip_path: str, script: str, script_args: list[str]) -> str:
    cmd = [
        SPARK_SUBMIT,
        "--master", MASTER,
        # real executor JVMs need explicit sizing below the worker cap
        "--conf", "spark.executor.memory=3g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", script),
        *script_args,
    ]
    # strip the repo from the child's import path: the zip must be the
    # sole provider of metacheck_spark on the executors AND the driver
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd="/", env=env, timeout=900
    )
    assert r.returncode == 0, f"spark-submit ({MASTER}) failed:\n{r.stderr[-5000:]}"
    return r.stdout


def test_pipeline_across_executor_boundary(zip_path, tmp_path):
    golden = {l["image_id"]: l for l in label_rows(gen_rows(N), url_status_map())}
    images = str(tmp_path / "images")
    write_images_parquet(images, N)
    audit = str(tmp_path / "audit")
    kept = str(tmp_path / "kept")

    out = _submit(zip_path, "run_job.py", [
        "--images", f"{images}/images.parquet",
        "--url-status", f"{images}/url_status.parquet",
        "--audit", audit, "--kept", kept,
        "--buckets", "8", "--salt", "4", "--run-ts", RUN_TS,
    ])
    n_keep = sum(1 for g in golden.values() if g["keep"])
    assert f"[kept] reconciled {n_keep} rows" in out

    con = duckdb.connect()
    rows = con.execute(
        "SELECT image_id, rule_hits, keep, scrubbed_caption "
        f"FROM read_parquet('{audit}/bucket=*/*.parquet', hive_partitioning=1)"
    ).fetchall()
    kept_rows = con.execute(
        "SELECT image_id, lang, scrubbed_caption "
        f"FROM read_parquet('{kept}/lang=*/*.parquet', hive_partitioning=1)"
    ).fetchall()
    con.close()

    got = {r[0]: r for r in rows}
    assert set(got) == set(golden)
    for i, g in golden.items():
        assert list(got[i][1]) == g["rule_hits"], i
        assert got[i][2] == g["keep"], i
        assert got[i][3] == g["scrubbed_caption"], i
    assert len({r[0] for r in kept_rows}) == len(kept_rows), "duplicate kept rows"
    assert {r[0] for r in kept_rows} == {i for i, g in golden.items() if g["keep"]}


def test_dedup_chain_across_executor_boundary(zip_path, tmp_path):
    """MinHash-LSH + connected components under real executor JVMs,
    verified against a DuckDB recursive-CTE transitive closure (LSH at
    threshold 0.8 on this corpus has recall 1.0 vs brute force, so the
    verified pair set equals the exact-Jaccard pair set)."""
    docs_src = f"{SF}/documents.parquet"
    docs = str(tmp_path / "docs")
    out = str(tmp_path / "clusters")

    # seed near-dup CHAINS (doc -> variant -> longer variant) so the
    # iterative label propagation actually runs multiple rounds
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text FROM read_parquet('{docs_src}') WHERE doc_id < 150
          UNION ALL
          SELECT doc_id + 100000, text || ' extra token'
          FROM read_parquet('{docs_src}') WHERE doc_id % 7 = 0 AND doc_id < 150
          UNION ALL
          SELECT doc_id + 200000, text || ' extra token extra token'
          FROM read_parquet('{docs_src}') WHERE doc_id % 7 = 0 AND doc_id < 150
        ) TO '{docs}' (FORMAT PARQUET)
        """
    )
    con.close()

    # Reliable-checkpoint mode (round-5 ask #3): the connected-components
    # rounds truncate lineage via spark.checkpoint files under ckpt_dir
    # instead of executor-local block storage — the executor-loss-tolerant
    # production mode — exercised here under REAL executor JVMs. The
    # default localCheckpoint mode stays covered by every other dedup
    # test (local[N] + the r4 local-cluster history).
    ckpt_dir = str(tmp_path / "ckpt")
    _submit(zip_path, "run_dedup_job.py", [
        "--docs", docs, "--out", out, "--threshold", "0.8",
        "--checkpoint-dir", ckpt_dir,
    ])
    ckpt_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckpt_dir)
        for f in fs
        if f.startswith("part-")
    ]
    assert ckpt_files, "reliable mode wrote no checkpoint files"

    con = duckdb.connect()
    got = dict(
        con.execute(
            f"SELECT id, cluster_id FROM read_parquet('{out}/*.parquet')"
        ).fetchall()
    )
    expected = dict(
        con.execute(
            f"""
WITH RECURSIVE sh AS (
  SELECT doc_id AS id,
         list_distinct(
           list_transform(
             range(1, len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+'))),
             i -> regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+')[i] || ' ' ||
                  regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+')[i+1]
           )
         ) AS sh
  FROM read_parquet('{docs}')
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.8
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
)
SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a
            """
        ).fetchall()
    )
    con.close()
    assert got == expected
    assert len(got) > 0
