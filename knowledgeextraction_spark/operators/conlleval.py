"""A9: conlleval chunk P/R/F1 as a pure DataFrame aggregation.

Reimplements the semantics of the CoNLL-2000 ``conlleval`` perl scorer
the reference shells out to (``utils/conlleval``, wrapped at
``test/LSTMNER/scores.py:4-14``) — chunk-level precision/recall/FB1
plus token accuracy — as windows + joins (no subprocess, no perl):

    chunk starts where tag is ``B-X``, or ``I-X`` after a different
    type; a chunk is correct iff gold and pred agree on (sentence,
    start, end, type).

Input format: one row per token, prefix-style BIO tags (``B-X``/
``I-X``/``O``). The reference's suffix tags (``X-B``) convert via
``to_prefix``.

Scale: two window passes partitioned by sentence + one join on chunk
identity — shuffle keys are sentence ids (uniform). Aggregation output
is a single row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def to_prefix(col):
    """``disease-B`` → ``B-disease`` (suffix → standard prefix format)."""
    return F.when(
        col.rlike(r".+-(B|I)$"),
        F.concat(
            F.regexp_extract(col, r"-(B|I)$", 1),
            F.lit("-"),
            F.regexp_replace(col, r"-(B|I)$", ""),
        ),
    ).otherwise(col)


def _chunks(tokens: DataFrame, tag_col: str) -> DataFrame:
    """(sent_id, pos, <tag_col>) → (sent_id, start, end, ctype) chunks."""
    t = F.col(tag_col)
    ctype = F.when(t == "O", F.lit(None)).otherwise(F.substring(t, 3, 1000))
    marker = F.when(t == "O", F.lit(None)).otherwise(F.substring(t, 1, 1))

    w = Window.partitionBy("sent_id").orderBy("pos")
    d = (
        tokens.select("sent_id", "pos", ctype.alias("ctype"), marker.alias("marker"))
        .withColumn("prev_type", F.lag("ctype").over(w))
        .withColumn(
            "is_start",
            F.when(F.col("ctype").isNull(), False).otherwise(
                (F.col("marker") == "B")
                | F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("ctype"))
            ),
        )
        .withColumn(
            "chunk_id", F.sum(F.col("is_start").cast("int")).over(w)
        )
    )
    return (
        d.filter(F.col("ctype").isNotNull())
        .groupBy("sent_id", "chunk_id", "ctype")
        .agg(F.min("pos").alias("start"), F.max("pos").alias("end"))
        .select("sent_id", "start", "end", "ctype")
    )


def conll_eval_by_type(
    tokens: DataFrame, gold_col: str = "gold", pred_col: str = "pred"
) -> DataFrame:
    """A10: seqeval-style ENTITY-LEVEL metrics per label type.

    The reference computes per-type P/R/F1 with seqeval over aligned
    BIO tags (test/albertNER/test_albert_ner.py:210-216, alignment at
    :194-208); the chunk semantics are the same as conlleval's (A9), so
    this reuses ``_chunks`` and groups the counts by chunk type instead
    of globally.  → one row per ctype: (ctype, gold_chunks, pred_chunks,
    correct_chunks, precision, recall, f1), ordered by ctype.

    Scale: the same two window passes as ``conll_eval``; the per-type
    aggregation output is #types rows, and the full-outer joins on
    ctype are dimension-sized.
    """
    gold_chunks = _chunks(tokens, gold_col)
    pred_chunks = _chunks(tokens, pred_col)
    correct = gold_chunks.join(pred_chunks, ["sent_id", "start", "end", "ctype"])

    g = gold_chunks.groupBy("ctype").agg(F.count("*").alias("gold_chunks"))
    p = pred_chunks.groupBy("ctype").agg(F.count("*").alias("pred_chunks"))
    c = correct.groupBy("ctype").agg(F.count("*").alias("correct_chunks"))

    return (
        g.join(p, "ctype", "full_outer")
        .join(c, "ctype", "full_outer")
        .select(
            "ctype",
            F.coalesce("gold_chunks", F.lit(0)).alias("gold_chunks"),
            F.coalesce("pred_chunks", F.lit(0)).alias("pred_chunks"),
            F.coalesce("correct_chunks", F.lit(0)).alias("correct_chunks"),
        )
        .select(
            "ctype",
            "gold_chunks",
            "pred_chunks",
            "correct_chunks",
            F.round(
                F.col("correct_chunks") / F.greatest("pred_chunks", F.lit(1)), 6
            ).alias("precision"),
            F.round(
                F.col("correct_chunks") / F.greatest("gold_chunks", F.lit(1)), 6
            ).alias("recall"),
            F.round(
                2.0
                * F.col("correct_chunks")
                / F.greatest(F.col("pred_chunks") + F.col("gold_chunks"), F.lit(1)),
                6,
            ).alias("f1"),
        )
        .orderBy("ctype")
    )


def conll_eval(tokens: DataFrame, gold_col: str = "gold", pred_col: str = "pred") -> DataFrame:
    """tokens(sent_id, pos, gold, pred) → one row of chunk metrics.

    Columns: n_tokens, token_accuracy, gold_chunks, pred_chunks,
    correct_chunks, precision, recall, f1 — matching conlleval's
    definitions.
    """
    gold_chunks = _chunks(tokens, gold_col)
    pred_chunks = _chunks(tokens, pred_col)
    correct = gold_chunks.join(pred_chunks, ["sent_id", "start", "end", "ctype"])

    counts = tokens.agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col(gold_col) == F.col(pred_col)).cast("int")).alias("n_correct_tok"),
    )
    g = gold_chunks.agg(F.count("*").alias("gold_chunks"))
    p = pred_chunks.agg(F.count("*").alias("pred_chunks"))
    c = correct.agg(F.count("*").alias("correct_chunks"))

    return (
        counts.crossJoin(g)
        .crossJoin(p)
        .crossJoin(c)
        .select(
            "n_tokens",
            F.round(F.col("n_correct_tok") / F.col("n_tokens"), 6).alias("token_accuracy"),
            "gold_chunks",
            "pred_chunks",
            "correct_chunks",
            F.round(F.col("correct_chunks") / F.greatest("pred_chunks", F.lit(1)), 6).alias(
                "precision"
            ),
            F.round(F.col("correct_chunks") / F.greatest("gold_chunks", F.lit(1)), 6).alias(
                "recall"
            ),
            F.round(
                2.0
                * F.col("correct_chunks")
                / F.greatest(F.col("pred_chunks") + F.col("gold_chunks"), F.lit(1)),
                6,
            ).alias("f1"),
        )
    )
