"""Adversarial mega-bucket gate (round-5 ask #4): ONE boilerplate
caption duplicated tens of thousands of times — the pathological LSH
input at web scale (every band bucket holds the entire duplicate set,
so naive in-bucket expansion is O(n^2) ~ 10^8 pairs here, ~10^14 at a
production 10^7-copy boilerplate cluster).

Pinned behavior, measured through the operator's own Observation
metrics (dedup.bucketed_candidate_pairs):
* the oversized buckets are star-routed — exactly bands x (n_dup - 1)
  ids take the O(bucket) path, none are dropped;
* the emitted candidate set is O(n): n_dup - 1 verified pairs, not
  ~n^2/2;
* cluster resolution still recovers the FULL boilerplate cluster
  (star edges preserve connectivity) — one cluster, min-id label, all
  n_dup members — alongside untouched unique docs.

The 100k-scale wall-clock artifact lives in BENCH_MEGABUCKET.json
(tools/run_megabucket.py); this test pins the same invariants at a
CI-sized n.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from metacheck_spark.caching import CacheRegistry
from metacheck_spark.operators import dedup as D

N_DUP = 20_000
N_UNIQ = 2_000
BANDS = 16
BOILER = (
    "all images on this site are provided as is without warranty of any "
    "kind contact the site administrator to request removal or takedown"
)


def _corpus(spark):
    boiler = spark.range(0, N_DUP, 1, 8).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text")
    )
    uniq = spark.range(1_000_000, 1_000_000 + N_UNIQ, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"tok{j}x"),
                    F.pmod(F.col("id") * F.lit(31 + 7 * j), F.lit(1000003)),
                )
                for j in range(10)
            ],
        ).alias("text"),
    )
    return boiler.unionAll(uniq)


def test_megabucket_star_routing_is_linear_and_connected(spark):
    docs = _corpus(spark)
    obs = Observation()
    with CacheRegistry() as caches:
        pairs = D.minhash_dedup_pairs(
            docs, "text", "doc_id", threshold=0.8,
            num_partitions="auto", caches=caches, observation=obs,
        )
        n_pairs = pairs.count()
        metrics = obs.get
        # O(bucket) routing: every duplicated band bucket ships hub->id
        # star rows; with identical text all `bands` buckets hold the
        # full duplicate set, so exactly bands x (n_dup - 1) ids are
        # star-routed (unique docs never form an oversized bucket).
        assert metrics["max_bucket_size"] == N_DUP
        assert metrics["star_routed_ids"] == BANDS * (N_DUP - 1)
        # O(n) candidate output: the distinct star pairs collapse to one
        # hub->id edge per duplicate; verification (jaccard == 1.0 on
        # identical text) keeps them all and admits nothing quadratic.
        assert n_pairs == N_DUP - 1

        labels = {
            r["id"]: r["cluster_id"]
            for r in D.dedup_clusters(pairs, caches=caches).collect()
        }
    # full boilerplate cluster recovered through the star edges
    assert len(labels) == N_DUP
    assert set(labels.values()) == {0}
