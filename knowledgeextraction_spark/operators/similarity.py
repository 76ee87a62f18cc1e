"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force top-k neighbors for a query subset —
  the exactness baseline. Cross join + window; fine at test scale and
  the correctness oracle for the ANN variant.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100-TB path:
  vectors shuffle once on their LSH key; candidates are same-bucket
  pairs only; top-k within candidates. Recall < 1 by design; we measure
  it in tests rather than pretend exactness.

Pairwise cosine scoring stays in Catalyst expressions
(zip_with/aggregate, matching the DuckDB oracle's fold order exactly);
the LSH KEYING runs as one Arrow-batched numpy GEMM per batch — the
64-plane × 64-dim higher-order-function chain was interpreter-bound
(see lsh_band_keys).
"""

from __future__ import annotations

import pandas as pd
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


def lsh_band_keys(
    embeddings: DataFrame, planes: list[list[float]], n_bands: int, bits: int
) -> DataFrame:
    """→ input + (band int, bucket long): ``n_bands`` rows per vector,
    band b keyed by planes[b·bits:(b+1)·bits] (exploded post-keying, so
    the scan itself is not amplified).

    Keys come from ONE Arrow-batched numpy GEMM per batch ([B, dim] ×
    [dim, bands·bits]) instead of Catalyst ``aggregate``/``zip_with``
    chains — higher-order functions evaluate a lambda per element
    (~bands·bits·dim interpreted calls per vector), which measured 4×
    slower than the whole rest of the query.  Sign agreement with the
    DuckDB oracle's ``list_dot_product`` holds to summation-order noise
    (~1e-13 relative): a flip needs a projection within that band of
    exactly zero — probability ~1e-13 per dot.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    p = np.asarray(planes, dtype=np.float64).T  # [dim, n_bands·bits]
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def band_buckets(emb: pd.Series) -> pd.Series:
        e = np.asarray(emb.tolist(), dtype=np.float64)  # [B, dim]
        bits_mat = (e @ p) > 0  # [B, n_bands·bits]
        keys = np.stack(
            [
                bits_mat[:, b * bits : (b + 1) * bits] @ weights
                for b in range(n_bands)
            ],
            axis=1,
        )  # [B, n_bands]
        return pd.Series(list(keys))

    entries = F.transform(
        band_buckets("embedding"),
        lambda k, b: F.struct(b.cast("int").alias("band"), k.alias("bucket")),
    )
    return embeddings.withColumn("bk", F.explode(entries)).select(
        "*", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    ).drop("bk")


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


# ---------------------------------------------------------------------------
# IVF — the inverted-file ANN variant (coarse quantizer → posting lists)
# ---------------------------------------------------------------------------


def make_ivf_centroids(dim: int, k: int = 16, seed: int = 41) -> list[list[float]]:
    """Deterministic data-INDEPENDENT coarse centroids (unit normal,
    row-normalized).  Used by the oracle-gated query so the DuckDB twin
    can inline them as literals; production trains them instead
    (``train_ivf_centroids``) — the partition/probe mechanics are
    identical either way."""
    import numpy as np

    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    return (c / np.linalg.norm(c, axis=1, keepdims=True)).tolist()


def train_ivf_centroids(
    embeddings: DataFrame, k: int = 16, iters: int = 5, sample: int = 4096, seed: int = 41
) -> list[list[float]]:
    """Coarse-quantizer training: seeded k-means on a driver-side sample
    (the standard IVF recipe — the quantizer trains on a bounded sample
    regardless of corpus size; assignment stays distributed).

    The sample is the ``sample`` LOWEST vec_ids, not a bare limit(): an
    unordered limit takes whatever partitions answer first, so the
    trained centroids would vary across runs/partitionings despite the
    seeded rng (ADVICE r3).  orderBy+limit compiles to TakeOrdered —
    a per-partition top-K then one K-row merge, no global sort."""
    import numpy as np

    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample)
        .toPandas()["embedding"]
        .tolist()
    )
    x = np.asarray(rows, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for j in range(len(cents)):
            m = x[assign == j]
            if len(m):
                v = m.mean(axis=0)
                cents[j] = v / max(np.linalg.norm(v), 1e-12)
    return cents.tolist()


def ivf_assign(
    df: DataFrame, centroids: list[list[float]], nprobe: int = 1
) -> DataFrame:
    """→ input + (centroid int): ``nprobe`` rows per vector, the ids of
    its top-``nprobe`` centroids by cosine (argmax dot against the
    row-normalized centroids — the vector's own norm is rank-invariant).
    One numpy GEMM per Arrow batch, same shape as lsh_band_keys; ties
    break to the lower centroid id (stable argsort — the DuckDB twin
    orders by (dot desc, id asc))."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64).T  # [dim, k]
    n = nprobe

    @pandas_udf("array<int>")
    def probes(emb: pd.Series) -> pd.Series:
        e = np.asarray(emb.tolist(), dtype=np.float64)  # [B, dim]
        dots = e @ c  # [B, k]
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype(np.int32)))

    return df.withColumn("centroid", F.explode(probes("embedding")))


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 41,
) -> DataFrame:
    """ANN top-k via an inverted file: every corpus vector lands in ONE
    posting list (its nearest centroid), every query probes its
    ``nprobe`` nearest lists, exact cosine ranks the candidates.

    Scale contract (the IVF counterpart of lsh_topk's): posting lists
    shuffle once on the centroid key; per-query candidate count is
    ~nprobe·n/k_centroids, so ``n_centroids`` grows ∝ corpus size
    (√n is the classic operating point) and recall is recovered by
    raising ``nprobe``, never by shrinking the centroid count.  Skewed
    lists (real data clusters unevenly) are the k-means trainer's job;
    a max-list cap like lsh_topk's ``max_bucket`` drops degenerate
    lists if training is skipped.  No distinct is needed downstream:
    corpus vectors appear in exactly one list, so (query, neighbor)
    candidate pairs are unique by construction.
    """
    if centroids is None:
        centroids = make_ivf_centroids(dim, n_centroids, seed)
    corpus = ivf_assign(
        embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        centroids,
        nprobe=1,
    ).select("neighbor_id", "centroid")
    probes = ivf_assign(
        queries.select(F.col("vec_id").alias("query_id"), "embedding"),
        centroids,
        nprobe=nprobe,
    ).select("query_id", "centroid")

    cand = probes.join(corpus, "centroid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    q_emb = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c_emb = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    scored = (
        cand.join(q_emb, "query_id")
        .join(c_emb, "neighbor_id")
        .withColumn("cosine", _cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bands: int = 8,
    bits_per_band: int = 8,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN top-k via multi-band OR-amplified sign LSH.

    ``n_bands`` bands × ``bits_per_band`` hyperplanes each; a pair is a
    candidate if it collides in ANY band, so for cosine similarity s
    (collision prob per plane p = 1 − θ/π):
    P(candidate) = 1 − (1 − p^bits)^bands — e.g. s=0.9 → 0.99 at 8×8,
    versus 0.43 for a single 8-bit table.

    Scale contract (the piece a single 256-bucket table gets wrong):
    the per-band bucket count is 2^bits and the within-bucket join costs
    Σ|bucket|² per band, so ``bits_per_band`` must grow with corpus
    size — bits ≈ log2(n / target_bucket_size) keeps expected bucket
    size constant (hyperplane keys on roughly-isotropic embeddings are
    near-uniform).  At 10^9 vectors: bits≈20 (≈1M buckets × ~1k rows),
    recall recovered by raising ``n_bands``, never by shrinking the key
    space.  ``max_bucket`` drops buckets larger than the cap before the
    join — the skew guard for degenerate keys (e.g. all-zero vectors);
    dropped mass is bounded and recall loss is measured, not silent.

    Candidate pairs are deduped ACROSS bands before scoring, so each
    surviving pair pays exactly one cosine.
    """
    planes = make_planes(dim, n_bands * bits_per_band, seed)
    qb = lsh_band_keys(
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding")),
        planes,
        n_bands,
        bits_per_band,
    ).select("query_id", "band", "bucket")
    cb = lsh_band_keys(
        embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding")),
        planes,
        n_bands,
        bits_per_band,
    ).select("neighbor_id", "band", "bucket")
    if max_bucket is not None:
        # cb is referenced twice below (bucket sizes + the capped join
        # probe) — materialize it once or the hyperplane-GEMM keying
        # UDF runs twice over the corpus
        cb = cb.localCheckpoint(eager=True)
        sizes = cb.groupBy("band", "bucket").agg(F.count("*").alias("n"))
        keep = sizes.filter(F.col("n") <= max_bucket).select("band", "bucket")
        cb = cb.join(keep, ["band", "bucket"])
        qb = qb.join(keep, ["band", "bucket"])

    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_emb = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c_emb = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    scored = (
        cand.join(q_emb, "query_id")
        .join(c_emb, "neighbor_id")
        .withColumn("cosine", _cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
