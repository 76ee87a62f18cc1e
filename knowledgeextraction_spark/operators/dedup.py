"""Deduplication family over a documents/pages table.

Beyond the reference (which has no dedup — nearest analog is the
order-sensitive seen-set W5, mrc_utils.py:397-415), these are the
standard large-scale training-data dedup operators, Spark-first:

- exact:      md5(normalized text) → keep min(doc_id) per hash.
              One shuffle (groupBy hash); at 100 TB the hash groupBy is
              the canonical dedup and AQE coalesces the skewless output.
- minhash LSH: word-shingle → per-band minhash signature → band-bucket
              join for candidate pairs → exact Jaccard verify.
              Shuffles: explode+groupBy for signatures (combine-enabled
              min agg), self-join on (band, sig) buckets — bucket keys
              are near-uniform by construction (hashes), so no skew.
- simhash:    64-bit-ish (60-bit) sign-aggregated word hash; near-dup =
              small Hamming distance. All md5/bit arithmetic — portable
              to the DuckDB oracle.
- embedding:  cosine near-dup over an embedding column; brute-force
              pair join at test scale, LSH-bucketed variant
              (similarity.py) as the 100-TB path.

Every hash is md5-based so the DuckDB correctness oracle can reproduce
results bit-for-bit (Spark's hash()/xxhash64 are not portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 8
SHINGLE = 3  # word 3-grams


def normalized_text(col="text"):
    """lower + collapse whitespace — the canonical dedup key."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """→ (content_hash, n_dups, keep_doc_id): groups with ≥2 members."""
    return (
        docs.select(F.col("doc_id"), F.md5(normalized_text()).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def word_shingles(col="text", n: int = SHINGLE):
    """array of word n-gram strings (space-joined, distinct)."""
    words = F.split(normalized_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) > 0))


def shingle_table(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.explode(word_shingles()).alias("shingle"))


def minhash_signatures(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """→ (doc_id, band, sig): per-band minhash via min(md5(band:shingle)).

    The agg is a map-side-combinable min — the shuffle moves one row per
    (doc, band), not one per shingle.
    """
    sh = shingle_table(docs)
    bands = docs.sparkSession.range(n_bands).select(
        F.col("id").cast("int").alias("band")
    )
    return (
        sh.crossJoin(F.broadcast(bands))
        .groupBy("doc_id", "band")
        .agg(
            F.min(
                F.md5(F.concat_ws(":", F.col("band").cast("string"), F.col("shingle")))
            ).alias("sig")
        )
    )


def lsh_candidate_pairs(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """→ (doc_a, doc_b) distinct candidate pairs sharing any band bucket."""
    sig = minhash_signatures(docs, n_bands)
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, candidates: DataFrame | None = None, threshold: float = 0.5
) -> DataFrame:
    """Exact word-shingle Jaccard for pairs ≥ threshold.

    With ``candidates`` (from LSH) only those pairs are verified — the
    100-TB path. Without, all co-shingled pairs are scored (test scale).
    """
    sh = shingle_table(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    if candidates is not None:
        # candidates-first: intersect shingles only for LSH candidate
        # pairs (candidates × avg-shingles rows) instead of exploding
        # the full co-shingle pair space and filtering afterwards
        inter = (
            candidates.join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_common"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_common"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 60) -> DataFrame:
    """→ (doc_id, simhash): sign-aggregated 60-bit word simhash.

    word hash = first 15 hex digits of md5 (portable to the oracle);
    bit b of the simhash = 1 iff Σ_words (±1 per bit) > 0, weighting
    each word by its occurrence count.
    """
    words = docs.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("word")
    ).filter(F.length("word") > 0)
    counted = words.groupBy("doc_id", "word").agg(F.count("*").alias("w"))
    hashed = counted.withColumn(
        "h", F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("long")
    )
    bit_ids = docs.sparkSession.range(bits).select(F.col("id").cast("int").alias("bit"))
    per_bit = (
        hashed.crossJoin(F.broadcast(bit_ids))
        .withColumn(
            "contrib",
            F.when(
                F.expr("(h >> bit) & 1") == 1,
                F.col("w"),
            ).otherwise(-F.col("w")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """→ (vec_a, vec_b, cosine) for pairs with cosine ≥ threshold.

    Brute-force pair join (test scale); the LSH-bucketed variant in
    similarity.py is the web-scale path. The dot product stays in
    Catalyst (zip_with + aggregate) — no Python.
    """
    def cos(e1, e2):
        dot = F.aggregate(
            F.zip_with(e1, e2, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        n1 = F.sqrt(F.aggregate(e1, F.lit(0.0), lambda a, v: a + v * v))
        n2 = F.sqrt(F.aggregate(e2, F.lit(0.0), lambda a, v: a + v * v))
        return dot / (n1 * n2)

    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos(F.col("e_a"), F.col("e_b")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
