"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force top-k neighbors for a query subset —
  the exactness baseline. Cross join + window; fine at test scale and
  the correctness oracle for the ANN variant.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100-TB path:
  vectors shuffle once on their LSH key; candidates are same-bucket
  pairs only; top-k within candidates. Recall < 1 by design; we measure
  it in tests rather than pretend exactness.

Dot products are Catalyst expressions (zip_with/aggregate) — JVM
codegen, no Python. For very high dims a Pandas-UDF matmul over Arrow
batches wins; at dim 64 expressions are faster than the Arrow hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(e1, e2):
    dot = F.aggregate(F.zip_with(e1, e2, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
    n1 = F.sqrt(F.aggregate(e1, F.lit(0.0), lambda a, v: a + v * v))
    n2 = F.sqrt(F.aggregate(e2, F.lit(0.0), lambda a, v: a + v * v))
    return dot / (n1 * n2)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """queries(vec_id, embedding) × corpus → (query_id, neighbor_id, cosine, rank).

    rank 1..k by cosine desc (neighbor_id asc tiebreak, excludes self).
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket(embeddings: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Sign-of-projection LSH key: bit b = 1 iff ⟨emb, plane_b⟩ > 0.

    ``planes``: driver-side list of hyperplane normals (deterministic,
    seeded) — tiny, inlined as literals into the plan.
    """
    key = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        key = key + F.when(dot > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return embeddings.withColumn("bucket", key)


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket."""
    planes = make_planes(dim, n_planes, seed)
    qb = lsh_bucket(
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding")), planes
    ).withColumnRenamed("embedding", "q_emb")
    cb = lsh_bucket(
        embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding")),
        planes,
    ).withColumnRenamed("embedding", "c_emb")
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
