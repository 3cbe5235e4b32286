"""Similarity search over embedding columns: brute-force cosine top-k as
the correctness baseline; two scale paths — sign-LSH (random hyperplanes)
bucketing, which shrinks the verify set to O(n / 2^bits) per query on
roughly-uniform data, and an IVF index (kmeans-lite coarse quantizer +
cluster-probed search), the standard shape when data is clustered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def signature_udf(planes: np.ndarray):
    """Sign-LSH signature as a vectorized pandas UDF — one numpy matmul
    per Arrow batch against the (closure-small) plane matrix. The native
    `signature_col` expression inlines bits x dim literal arrays into the
    plan, which blows up codegen beyond ~8 bits; this path scales to 63
    bits with constant plan size. Bit b set iff dot(vec, plane_b) > 0 —
    identical semantics to signature_col (asserted in tests)."""
    if len(planes) > 63:
        raise ValueError("signature_udf supports at most 63 bits (long)")
    P = np.asarray(planes, dtype=np.float64)

    @F.pandas_udf("long")
    def _sig(s: pd.Series) -> pd.Series:
        # null vectors -> all-zero rows -> signature 0, matching the
        # native signature_col path (when(null > 0) falls to otherwise(0))
        x = np.array(
            [list(v) if v is not None else [0.0] * P.shape[1] for v in s],
            dtype=np.float64,
        )
        if x.size == 0:
            return pd.Series(np.zeros(len(s), dtype=np.int64), index=s.index)
        bits = (x @ P.T) > 0
        weights = 1 << np.arange(P.shape[0], dtype=np.uint64)
        sig = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pd.Series(sig.view(np.int64), index=s.index)

    return _sig


def signature(vec_col: str, planes: np.ndarray):
    """Signature column, picking the native expression for <= 8 bits and
    the Arrow-batched UDF beyond (the expression inlines bits x dim
    literals; fine small, quadratic plan text at high bits)."""
    if len(planes) <= 8:
        return signature_col(vec_col, planes)
    return signature_udf(planes)(F.col(vec_col))


def embedding_dup_pairs_bucketed(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    bits: int = 16,
    bands: int = 4,
    dim: int | None = None,
    seed: int = 42,
    max_bucket: int = 1000,
    caches=None,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: sign-LSH banding for candidate
    generation (pairs sharing ANY band of the signature — multi-band
    boosts recall for pairs straddling a single hyperplane), exact cosine
    verification. Reuses the LSH bucket-join machinery of
    operators/dedup.py — one narrow shuffle per band, never O(n^2).
    Exact duplicates always share every band, so recall on true copies
    is 1.0 whenever at least one shared bucket is <= max_bucket or the
    bucket's hub (min id) is itself a cluster member — in the oversized-
    bucket regime candidates are star pairs around the hub, so a copy
    pair hiding behind a non-duplicate hub in EVERY shared bucket would
    be missed (same honest boilerplate-cluster framing as
    bucketed_candidate_pairs)."""
    from metacheck_spark.operators.dedup import bucketed_candidate_pairs

    assert bits % bands == 0, "bits must divide into equal bands"
    if dim is None:
        head = df.select(F.size(vec_col)).limit(1).collect()
        if not head:
            return df.sparkSession.createDataFrame(
                [], f"id_a {df.schema[id_col].dataType.simpleString()},"
                    f" id_b {df.schema[id_col].dataType.simpleString()}, cos double"
            )
        dim = head[0][0]
    planes = hyperplanes(dim, bits, seed)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    from metacheck_spark.caching import persist_owned

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # cache ownership: the signature frame feeds banding AND the two
    # verify joins; it must stay persisted until the caller's action runs
    # (the returned plan is lazy). Pass a CacheRegistry as `caches` to
    # release it afterwards; without one it stays persisted after return
    # (bench.py's clearCache-per-pass discipline handles that there).
    sig = persist_owned(v.withColumn("sig", signature("v", planes)), caches)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "bv.band", "bv.band_sig")
    cands = bucketed_candidate_pairs(banded, max_bucket=max_bucket)
    a = sig.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = sig.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --- IVF (inverted-file) index: kmeans-lite coarse quantizer ----------------


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iters: int = 10,
    sample: int = 4096,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Lloyd's kmeans (cosine) on a bounded driver-side sample — the
    coarse quantizer of an IVF index is always trained on a sample
    (centroids are tiny; only they ship back to executors).

    Fully deterministic AND engine-portable, so the driver oracle
    (_ivf_topk_sql in __spark_entry__) can retrain the quantizer
    independently in SQL: the sample is the `sample` rows with the
    smallest Knuth multiplicative hash of the id — an UNBIASED
    pseudo-random draw (smallest-id sampling biased the quantizer to
    whatever the low ids happen to contain) that is still a
    TakeOrderedAndProject (per-partition top-k, no full sort, nothing
    driver-sorted). The hash is plain 63-bit-safe integer arithmetic,
    h(id) = ((id mod 2^31) * 2654435761) mod 2^31, so DuckDB computes
    the identical sample; init centroids are the rows at evenly spaced
    ranks of that hash-ordered sample (no RNG), argmax ties resolve to
    the lowest cluster index, and an empty cluster keeps its previous
    centroid."""
    hcol = F.pmod(
        F.pmod(F.col(id_col).cast("long"), F.lit(2147483648))
        * F.lit(2654435761),
        F.lit(2147483648),
    )
    rows = (
        df.select(id_col, vec_col)
        .orderBy(hcol.asc(), F.col(id_col).asc())
        .limit(sample)
        .collect()
    )
    x = np.array([list(r[1]) for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n = len(x)
    k = min(n_clusters, n)
    cent = x[[(i * n) // k for i in range(k)]].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)  # ties -> lowest cluster index
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment as a vectorized pandas UDF — one numpy
    matmul per Arrow batch against the (broadcast-small) centroid matrix.
    At ingest time this column is written once and the table is clustered/
    partitioned by it, making ivf_topk a partition-pruned scan."""
    cent = centroids  # closure-captured; small

    @F.pandas_udf("int")
    def assign_udf(s: pd.Series) -> pd.Series:
        x = np.array([list(v) for v in s], dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cent.T).argmax(axis=1).astype(np.int32), index=s.index)

    return df.withColumn(out_col, assign_udf(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """ANN top-k: probe the nprobe clusters nearest the query, brute-force
    cosine only inside them. With the table partitioned by cluster the
    filter prunes partitions at the scan. df must carry cluster_col
    (assign_clusters at ingest)."""
    q = np.array(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    # stable descending sort: ties resolve to the lowest cluster index,
    # matching the SQL oracle's ORDER BY dot DESC, c
    probes = [int(c) for c in np.argsort(-(centroids @ q), kind="stable")[:nprobe]]
    qlit = _query_lit(query_vec)
    return (
        df.filter(F.col(cluster_col).isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )
