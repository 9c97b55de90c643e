"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as a crossJoin + window rank (exact,
O(n*q) — fine when the query set is small and broadcastable). Scale path:
random-hyperplane LSH bucketing so candidate generation is a bucket
equi-join, plus an IVF-style coarse quantizer (nearest of k centroids ->
search only that cell). Dot products are expression-only (`zip_with` +
`aggregate` — JVM codegen); no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a, b):
    """Sum of elementwise products, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small — it is broadcast, so the crossJoin is a
    BroadcastNestedLoopJoin (no shuffle of the big side; the big side
    streams once).
    """
    joined = df.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(qvec_col)).alias("cos"),
    )
    w = W.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------- random-hyperplane LSH
def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from n_planes random hyperplanes (expression-only)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col if not isinstance(vec_col, str) else F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The bucket join replaces the crossJoin — at scale the corpus is
    pre-bucketed (written bucket-partitioned), so a query probes one bucket.
    """
    b_df = df.withColumn("_b", lsh_bucket(F.col(vec_col), planes))
    b_q = queries.withColumn("_b", lsh_bucket(F.col(qvec_col), planes))
    joined = b_df.join(F.broadcast(b_q), "_b").filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col), F.col(id_col),
        cosine(F.col(vec_col), F.col(qvec_col)).alias("cos"),
    )
    w = W.partitionBy(qid_col).orderBy(F.desc("cos"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------------------- IVF coarse
def kmeans_centroids(df: DataFrame, vec_col: str, n_cells: int, iters: int = 5,
                     seed: int = 42) -> list[list[float]]:
    """Tiny driver-side k-means over a sample (coarse quantizer training).

    Sampling + driver fit is the standard IVF pattern: the model is small
    (n_cells × dim); assignment stays distributed.
    """
    sample = np.array(
        df.select(vec_col).limit(10_000).toPandas()[vec_col].tolist(), dtype=np.float64
    )
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent.tolist()


def ivf_cell(vec_col, centroids: list[list[float]]):
    """Nearest-centroid cell id (expression-only argmin over cells)."""
    c = vec_col if not isinstance(vec_col, str) else F.col(vec_col)
    dists = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(c, F.array(*[F.lit(float(x)) for x in cent]),
                           lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0), lambda acc, v: acc + v,
            ).alias("d"),
            F.lit(i).alias("cell"),
        )
        for i, cent in enumerate(centroids)
    ])
    return F.array_min(dists)["cell"]
