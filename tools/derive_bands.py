#!/usr/bin/env python
"""Derive bench.py's per-query adjudication bands from the accumulated
observation corpus (round-5 ask #5) instead of hand-editing them.

Inputs: every BENCH_r0*.json and BENCH_PROTOCOL_r0*.json in the repo
root. Each contains one or more benchmark payloads (dicts with
queries/sf/cpus, r4+ also observations/noisy_queries) at the pinned
config (sf0.1 documents, 60k images, local[32]); payloads at any other
config are ignored.

Derivation rule, per query:
* a RUN-MIN is the min the payload reported for the query (its
  `queries` entry — already min-of-k within that invocation);
* run-mins are rejected as stall-poisoned when (a) the payload itself
  flagged the query in noisy_queries, or (b) the run-min exceeds 2.5x the
  median run-min across the corpus (this excludes exactly the two
  historically adjudicated poisoned artifacts: r02 events_json 8.77s
  vs ~0.4s, r03 quality_pipeline 16.31s vs 2.4-5.5s);
* hi = 1.5 x max(clean run-mins), rounded up to 2 decimals — wide
  enough that every host-noise reading the protocol later recovered
  (e.g. lsh_topk 0.974 in BENCH_r04) sits inside the band, while a
  genuine 2x regression of the best-known clean capability still
  flags;
* lo = 0.8 x min(all observations) — informational only (faster is an
  improvement; bench.py never retries below-band readings).

Output: BANDS.json at the repo root (bench.py loads it at import).
Rerun this script whenever a new round's artifacts land.
"""

from __future__ import annotations

import glob
import json
import math
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PINNED = {"sf": 0.1, "cpus": 32, "images_rows": 60000}


def _payloads(obj, source):
    """Yield every pinned-config benchmark payload in a JSON object."""
    if isinstance(obj, dict):
        if isinstance(obj.get("queries"), dict) and "sf" in obj:
            if all(obj.get(k) == v for k, v in PINNED.items()):
                yield source, obj
            return
        for k, v in obj.items():
            yield from _payloads(v, f"{source}/{k}")
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            yield from _payloads(v, f"{source}[{i}]")


def _recover_tail(tail: str):
    """BENCH_r0N.json stores the bench stdout tail; when the driver's
    `parsed` field is null the JSON line survived truncated at the
    front — recover the queries/observations objects by raw-decoding
    from their key positions."""
    out = {}
    dec = json.JSONDecoder()
    for key in ("queries", "observations", "sf", "cpus", "images_rows",
                "noisy_queries"):
        pos = tail.rfind(f'"{key}": ')
        if pos < 0:
            continue
        try:
            val, _ = dec.raw_decode(tail[pos + len(f'"{key}": '):])
        except ValueError:
            continue
        out[key] = val
    return out if "queries" in out else None


def collect():
    runs = []  # (source, payload)
    for path in sorted(
        glob.glob(os.path.join(REPO, "BENCH_r0*.json"))
        + glob.glob(os.path.join(REPO, "BENCH_PROTOCOL_r0*.json"))
    ):
        name = os.path.basename(path)
        doc = json.load(open(path))
        if isinstance(doc, dict) and doc.get("parsed") is None and "tail" in doc:
            rec = _recover_tail(doc["tail"])
            if rec and all(rec.get(k) == v for k, v in PINNED.items()):
                runs.append((f"{name}(tail)", rec))
            continue
        if isinstance(doc, dict) and "parsed" in doc:
            doc = doc["parsed"]
        runs.extend(_payloads(doc, name))
    return runs


def derive(runs):
    run_mins: dict[str, list[tuple[str, float]]] = {}
    all_obs: dict[str, list[float]] = {}
    for source, p in runs:
        noisy = set(p.get("noisy_queries") or [])
        for q, v in p["queries"].items():
            if not isinstance(v, (int, float)):
                continue
            run_mins.setdefault(q, []).append(
                (source, float(v)) if q not in noisy else (source + "!noisy", math.inf)
            )
            obs = (p.get("observations") or {}).get(q) or [v]
            all_obs.setdefault(q, []).extend(float(o) for o in obs)
        # noisy run-mins: keep the observation floor (it is real data —
        # the min over a poisoned epoch still bounds lo), drop from hi
    bands = {}
    audit = {}
    for q, entries in sorted(run_mins.items()):
        mins = [v for _, v in entries if math.isfinite(v)]
        if not mins:
            continue
        med = statistics.median(mins)
        clean = [(s, v) for s, v in entries if math.isfinite(v) and v <= 2.5 * med]
        rejected = [
            (s, v) for s, v in entries
            if not math.isfinite(v) or v > 2.5 * med
        ]
        hi = math.ceil(max(v for _, v in clean) * 1.5 * 100) / 100
        lo = math.floor(min(all_obs[q]) * 0.8 * 100) / 100
        bands[q] = [lo, hi]
        audit[q] = {
            "clean_run_mins": [[s, v] for s, v in clean],
            "rejected": [[s, ("noisy" if not math.isfinite(v) else v)]
                         for s, v in rejected],
        }
    return bands, audit


def main() -> None:
    runs = collect()
    bands, audit = derive(runs)
    out = {
        "pinned_config": PINNED,
        "rule": (
            "hi = 1.5 x max(clean run-mins), clean = not flagged noisy and "
            "<= 2.5 x median run-min; lo = 0.8 x min(all observations), "
            "informational"
        ),
        "sources": sorted({s.split("/")[0].split("(")[0] for s, _ in runs}),
        "bands": bands,
        "audit": audit,
    }
    path = os.path.join(REPO, "BANDS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[derive_bands] {len(bands)} query bands from {len(runs)} runs -> {path}")
    for q, b in sorted(bands.items()):
        print(f"  {q:20s} {b}")


if __name__ == "__main__":
    sys.exit(main())
