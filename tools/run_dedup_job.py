#!/usr/bin/env python
"""spark-submit entrypoint for the shuffle-heavy dedup chain — MinHash-LSH
near-dup pairs verified by exact shingle Jaccard, then connected-components
cluster resolution:

    spark-submit --py-files dist/metacheck_spark.zip \
        tools/run_dedup_job.py --docs <parquet> --out <path> \
        [--threshold 0.8] [--id-col doc_id] [--text-col text]

Writes (id, cluster_id) parquet. Exists so the dedup chain — banded
signature shuffles, persisted candidate frames, broadcasts, the iterative
localCheckpoint loop — can be exercised under REAL executor boundaries
(--master local-cluster[2,4,...]: separate worker JVMs, serialized
broadcasts, --py-files shipping), not just local[N] threads
(tests/test_local_cluster.py gates this).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--checkpoint-dir",
        default=None,
        help="reliable-checkpoint directory (HDFS/object storage on a real "
        "cluster) for the connected-components rounds; omitting it uses "
        "executor-local checkpoints",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("metacheck-dedup-chain").getOrCreate()

    from metacheck_spark.caching import CacheRegistry
    from metacheck_spark.operators.dedup import dedup_clusters, minhash_dedup_pairs

    docs = spark.read.parquet(args.docs)
    with CacheRegistry() as caches:
        pairs = minhash_dedup_pairs(
            docs,
            args.text_col,
            args.id_col,
            threshold=args.threshold,
            num_partitions="auto",
            caches=caches,
        )
        clusters = dedup_clusters(
            pairs, caches=caches, checkpoint_dir=args.checkpoint_dir
        )
        clusters.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    print(f"[dedup] wrote {n} labeled docs to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
