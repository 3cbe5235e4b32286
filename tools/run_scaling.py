#!/usr/bin/env python
"""Evidence for the north_rule's two-cluster-size scaling criterion.

No real cluster exists in the sandbox, so per the task note the same job —
the full quality-filter pipeline via `bench.py --pipeline-only` — runs at
two CLUSTER SIZES emulated by CPU affinity: ``taskset -c 0..N-1`` with
``local[N]`` vs ``taskset -c 0..4N-1`` with ``local[4N]``, on the SAME
cached input. Affinity is what actually bounds compute the way executor
count does on a cluster — a bare ``local[N]`` under-counts, because each
task pipelines its chained pandas-UDF stages through extra Python worker
processes that the OS schedules onto cores beyond the N task slots.

    efficiency = (rows_per_sec@4N / rows_per_sec@N) / 4

Target: efficiency >= 0.8 (BASELINE.json north_rule). Results are written
to BENCH_SCALING.json and summarized in BASELINE.md.

Usage: python tools/run_scaling.py [N] [rows] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_IMAGES_ROWS"] = str(rows)
    out = subprocess.run(
        [
            "taskset",
            "-c",
            f"0-{cpus - 1}",
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--pipeline-only",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 240000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    results = {"n_cpus": n, "rows": rows, "runs": {"low": [], "high": []}}
    for level, cpus in (("low", n), ("high", 4 * n)):
        for _ in range(repeats):
            r = run_once(cpus, rows)
            results["runs"][level].append(r)
            print(
                f"[scaling] local[{cpus}]: {r['value']}s "
                f"({r['rows_per_sec']} rows/s)",
                file=sys.stderr,
                flush=True,
            )

    best_low = max(r["rows_per_sec"] for r in results["runs"]["low"])
    best_high = max(r["rows_per_sec"] for r in results["runs"]["high"])
    eff = round((best_high / best_low) / 4, 3)
    results.update(
        {
            "rows_per_sec_low": best_low,
            "rows_per_sec_high": best_high,
            "speedup": round(best_high / best_low, 3),
            "scaling_efficiency": eff,
            "target": 0.8,
            "pass": eff >= 0.8,
        }
    )
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "runs"}))


if __name__ == "__main__":
    main()
