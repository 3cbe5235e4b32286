"""Measure the serialized task-binary broadcast of entry-point queries.

For each query this spawns a FRESH interpreter/JVM, materializes the
query's full output through the `noop` sink (count() would let Catalyst
prune the output projection away — the one thing being measured), and
parses every `Broadcasting large task binary with size N` warning Spark's
DAGScheduler emits (it only warns above 1000 KiB, so a query that prints
nothing has every stage under ~1 MiB). The per-query MAX is the number
that matters at scale: it is what every executor fetches at stage launch.

Usage: python tools/measure_task_binary.py [sf_dir] [name ...]
Writes TASKBINARY.json at the repo root (one entry per measured query).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

DEFAULT_QUERIES = [
    "somef_jsonld",
    "somef_nested_full",
    "somef_nested",
    "rule_flags",
    "quality_summary",
]

_CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from metacheck_spark import get_spark

name, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark(master="local[8]", shuffle_partitions=8)
df = entry_mod.queries()[name](spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
spark.stop()
"""

_WARN = re.compile(
    r"Broadcasting large task binary with size ([\d.]+) (KiB|MiB|GiB)"
)
_UNIT_KIB = {"KiB": 1.0, "MiB": 1024.0, "GiB": 1024.0 * 1024.0}


def measure(name: str, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, name, sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    sizes_kib = [
        round(float(m.group(1)) * _UNIT_KIB[m.group(2)], 1)
        for m in _WARN.finditer(proc.stderr)
    ]
    return {
        "ok": proc.returncode == 0,
        "broadcast_warnings_kib": sizes_kib,
        "max_task_binary_kib": max(sizes_kib) if sizes_kib else None,
        "note": None if sizes_kib else "no warning: every stage < ~1 MiB",
        **({"stderr_tail": proc.stderr[-2000:]} if proc.returncode else {}),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT_QUERIES
    out = {"sf_dir": sf_dir, "queries": {}}
    failed = False
    for name in names:
        res = measure(name, sf_dir)
        out["queries"][name] = res
        mx = res["max_task_binary_kib"]
        print(f"{name:24s} max_task_binary="
              f"{'<1024' if mx is None else mx} KiB  ok={res['ok']}")
        failed |= not res["ok"]
    with open("/root/repo/TASKBINARY.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
