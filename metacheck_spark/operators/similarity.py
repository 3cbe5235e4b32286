"""Similarity search over embedding columns: brute-force cosine top-k as
the correctness baseline, sign-LSH (random hyperplanes) bucketing as the
scale path — candidates per bucket shrink the verify set from O(n) to
O(n / 2^bits) per query on roughly-uniform data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metacheck_spark.operators.dedup import cosine


def _query_lit(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k — one narrow scan + a k-row total sort
    (Spark's TakeOrderedAndProject: per-partition top-k then a k-sized
    merge on the driver, no full sort/shuffle)."""
    q = _query_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((bits, dim))


def signature_col(vec_col: str, planes: np.ndarray):
    """Sign-LSH bucket id as a native expression: bit b set iff
    dot(vec, plane_b) > 0. No UDF — bits x dim multiply-adds, codegen'd."""
    bits = []
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def lsh_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, bits: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42,
) -> DataFrame:
    """ANN top-k: restrict the brute-force scan to the query's LSH bucket.
    Approximate — recall measured in tests/test_dedup_similarity.py. In
    production the signature is precomputed at ingest and the table is
    bucketed/partitioned by it, turning this into a single-partition scan."""
    planes = hyperplanes(len(query_vec), bits, seed)
    qsig = int(sum((1 << b) for b, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0))
    q = _query_lit(query_vec)
    return (
        df.withColumn("sig", signature_col(vec_col, planes))
        .filter(F.col("sig") == qsig)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )
