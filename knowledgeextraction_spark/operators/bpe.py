"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-construction stage of a pretraining pipeline, in the
formulation that actually scales: the corpus collapses ONCE into a
word-frequency table (one map-side-combinable groupBy over the token
stream — linear in corpus size), and every merge round thereafter
operates on that vocabulary table only (~10^5-10^7 rows at any corpus
scale, never the corpus).  Per round: adjacent-pair counts (narrow
array transform + explode + one bounded groupBy), a driver-side argmax
of ONE row (TakeOrdered — the same bounded collect the pagerank /
IVF-centroid loops use), and a narrow fold applying the merge to every
word's symbol array; vocabulary lineage is cut per round.

Determinism is exact, not quantized: counts are integers and the
tie-break is (freq desc, left asc, right asc) — Spark's UTF8 binary
ordering equals python's code-point ordering (UTF-8 preserves it), so
the independent single-node oracle (oracle/bpe.py) reproduces the
merge sequence bit-for-bit; the committed golden parquet is the
driver's value oracle (merge APPLICATION is not SQL-expressible).

The greedy left-to-right merge-application is a left fold over the
symbol array: the accumulator's last element merges with the current
symbol iff they equal (left, right).  This is equivalent to the
classic index-scan because a merged token can never re-match as
``left`` in the same step it was produced unless it literally equals
``left`` — impossible, since ``left+right`` is strictly longer than
``left``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _materialize, normalized_text

N_MERGES = 20
END_MARK = "</w>"


def word_freq_table(docs: DataFrame) -> DataFrame:
    """→ (word, freq): whitespace tokens of the normalized text with
    corpus frequencies — the ONE corpus-sized pass of BPE training."""
    w = docs.select(
        F.explode(F.split(normalized_text(), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return w.groupBy("word").agg(F.count("*").cast("long").alias("freq"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(syms, freq) → (left, right, freq): freq-weighted adjacent pair
    counts over the vocabulary's symbol arrays."""
    from .dedup import adjacent_structs

    pairs = adjacent_structs(F.col("syms"), "left", "right")
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def _merge_expr(syms, a: str, b: str):
    """expression replacing every adjacent (a, b) in the symbol array
    with a+b, greedily left-to-right (left fold; see module
    docstring)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    return vocab.select(
        _merge_expr(F.col("syms"), a, b).alias("syms"), "freq"
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    use_local_checkpoint: bool = True,
) -> list[tuple[int, str, str, int]]:
    """→ [(rank, left, right, freq)]: the learned merge sequence (at
    most ``n_merges`` — stops early when no pairs remain).  The only
    driver-side data is one (left, right, freq) row per round."""
    vocab = _materialize(
        word_freq_table(docs).select(
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(END_MARK))
            ).alias("syms"),
            "freq",
        ),
        use_local_checkpoint,
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, f = best[0]["left"], best[0]["right"], best[0]["freq"]
        merges.append((rank, a, b, int(f)))
        vocab = _materialize(
            _apply_merge(vocab, a, b), use_local_checkpoint
        )
    return merges


def merge_table(
    docs: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """the merge sequence as a DataFrame (rank, left, right, freq)."""
    spark = docs.sparkSession
    return spark.createDataFrame(
        train_bpe(docs, n_merges),
        "rank long, left string, right string, freq long",
    )


def encode_token_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]] | None = None,
    n_merges: int = N_MERGES,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """→ (doc_id, n_words, n_bpe_tokens): the ENCODE step — apply the
    learned merge sequence (rank order) and count the resulting BPE
    tokens per document (the number every packing/budgeting stage
    actually consumes).  ``merges`` defaults to training on ``docs``
    itself.

    Scale shape: each DISTINCT word is encoded once — the merge folds
    chain over the distinct-word table (vocabulary-bounded), which
    then joins back onto the doc→word stream on the uniform word key
    (shuffle join: at web scale the vocabulary outgrows a broadcast)
    and folds into one groupBy(doc_id).  The corpus stream is never
    folded through the 20-deep merge expression."""
    if merges is None:
        merges = train_bpe(docs, n_merges, use_local_checkpoint)
    # the corpus-sized word stream feeds both the distinct-vocab branch
    # and the final join — cut the lineage so the scan+explode runs once
    stream = _materialize(
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text(), " ")).alias("word"),
        ).filter(F.length("word") > 0),
        use_local_checkpoint,
    )
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_MARK)))
    for _rank, a, b, _f in merges:
        syms = _merge_expr(syms, a, b)
    vocab_tok = (
        stream.select("word")
        .distinct()
        .select("word", F.size(syms).cast("long").alias("w_tokens"))
    )
    return (
        stream.join(vocab_tok, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("w_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )
