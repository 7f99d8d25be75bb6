"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (pure Catalyst: zip_with
+ aggregate, broadcast queries — no Python). The scale path is random-
hyperplane LSH bucketing: at 10^9+ vectors the bucket equi-join touches only
candidate buckets instead of the full cross product; planes are a small seeded
numpy matrix shipped as literals, so bucket assignment is still whole-stage
codegen. An IVF variant (k-means coarse quantizer) would slot in the same way
— bucket id from nearest centroid — and is left to the LSH machinery since the
sandbox has no MLlib model persistence needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, embedding). The query side is broadcast — the corpus
    never shuffles; ranking is a per-query window over the scored scan.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv__"))
    scored = df.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv__")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def all_pairs_above(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact; O(n²) — small n or use
    LSH buckets below as the blocking stage at scale)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


# --- IVF (inverted-file) ANN ------------------------------------------------------
def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    max_train: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: spherical k-means (cosine) trained DRIVER-side
    on a bounded sample — the standard IVF construction (FAISS trains its
    quantizer on a sample the same way): the centroid table is k×dim floats,
    tiny by design, while the corpus never leaves the cluster. Returns
    L2-normalized centroids (k, dim)."""
    n = df.count()
    if n == 0:
        raise ValueError("train_ivf_centroids: no vectors to train on")
    frac = min(1.0, max_train / max(n, 1))
    sample = df.select(vec_col).sample(False, frac, seed).limit(max_train).collect()
    x = np.asarray([r[0] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _centroid_dots(vec_col: str, centroids: np.ndarray) -> Column:
    return F.array(
        *[
            _dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in c]))
            for c in centroids
        ]
    )


def assign_ivf_buckets(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Nearest-centroid bucket id (argmax cosine against normalized
    centroids). Two map-only paths, same results:

      * k ≤ 64: the dot products unroll as literal Catalyst expressions —
        whole-stage codegen, zero Python;
      * k > 64: a vectorized pandas UDF (one Arrow batch matmul + argmax) —
        at quantizer sizes like k=4096, 4096 unrolled expressions per row
        stop being codegen-friendly while one BLAS matmul per batch is.
    """
    k = len(centroids)
    if k <= 64:
        dots = _centroid_dots(vec_col, centroids)
        # argmax via max-of-(dot, -idx) struct: first occurrence wins ties,
        # matching numpy argmax
        best = F.array_max(
            F.zip_with(
                dots,
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda d, i: F.struct(d.alias("d"), (-i).alias("ni")),
            )
        )
        return df.withColumn(out_col, (-best["ni"]).cast("int"))
    cent = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        x = np.asarray(v.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(x @ cent.T, axis=1).astype(np.int32))

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus vectors live in their nearest-
    centroid bucket; each query scores only its ``nprobe`` nearest buckets.

    Candidates per query ≈ nprobe/k_centroids of the corpus — bounded and
    tunable, never all-pairs; the bucketed corpus can be WRITTEN partitioned
    by bucket so probes prune at the scan (the inverted-file layout). The
    query side is tiny and broadcast; probe selection is the same centroid
    dot array sorted descending, sliced to nprobe — all Catalyst."""
    from pyspark.sql import Window

    kc = len(centroids)
    nprobe = min(nprobe, kc)
    corpus = assign_ivf_buckets(df, centroids, vec_col)
    dots = _centroid_dots(vec_col, centroids)
    probe_arr = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dots,
                    F.sequence(F.lit(0), F.lit(kc - 1)),
                    lambda d, i: F.struct((-d).alias("nd"), i.alias("i")),
                )
            ),
            lambda s: s["i"],
        ),
        1,
        nprobe,
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv__"),
        F.explode(probe_arr).alias("bucket"),
    )
    scored = corpus.join(F.broadcast(q), "bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv__")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def assign_lsh_buckets(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-of-projection LSH bucket id (long) — pure expressions, planes are
    literals, so this is a map-only stage with no Python."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(F.col(vec_col), lit_plane) > 0).cast("int")
        # the accumulator must be LONG: int shiftleft masks the amount mod 32,
        # so plane 32 would silently collide with plane 0 at n_planes > 32
        bucket = bucket + F.shiftleft(bit.cast("long"), i)
    return df.withColumn(out_col, bucket)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket
    — plus, with ``probe_radius ≥ 1``, every bucket within that many bit
    flips (multi-probe LSH, the public Lv et al. VLDB'07 construction).

    Exact-bucket-only recall collapses as n_planes grows (a true neighbor
    disagreeing on ONE plane is lost); probing the hamming-1 neighborhood
    costs n_planes extra broadcast keys per query — candidates stay
    ~(1+n_planes)·n/2^n_planes, bounded, never all-pairs — and restores
    recall at large n_planes. The corpus side is untouched (one bucket per
    vector), so a corpus written partitioned by bucket still prunes at the
    scan; only the tiny broadcast query side fans out.
    """
    from itertools import combinations

    from pyspark.sql import Window

    if probe_radius < 0:
        raise ValueError("probe_radius must be >= 0")
    n_planes = len(planes)
    flips = [0]
    for r in range(1, probe_radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            flips.append(m)
    corpus = assign_lsh_buckets(df, planes, vec_col)
    q = (
        assign_lsh_buckets(queries, planes, vec_col)
        .select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qv__"),
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in flips])
            ).alias("bucket"),
        )
    )
    scored = corpus.join(F.broadcast(q), "bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv__")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
