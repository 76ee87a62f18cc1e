"""M6/M7: NRE pair encoding as a batched Spark operator.

The reference encodes and classifies one (sentence, head, tail) item at
a time (models.py:10-18 — its own row-at-a-time inefficiency, SURVEY.md
§2.8 M7); here encoding runs Arrow-batched over the linked mention
pairs that the triple stage produces. The classifier head itself is
rule-based per [NORTH] (operators/triples.py); this operator exists for
downstream model-based relation extraction parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# pair_id = h_start·PAIR_ID_BASE + t_start must be collision-free, which
# needs PAIR_ID_BASE > max record length.  Records come from the packer
# (cap MAX_SEQ_LENGTH − 2 = 382); the margin below survives any packing
# cap up to 100k chars, and the assert turns a future cap raise beyond
# that into an import error instead of silent duplicate pair_ids (which
# would make q_kg_relations_scored's orderBy nondeterministic).
PAIR_ID_BASE = 100_000

from ..core.featurize import MAX_SEQ_LENGTH as _MAX_SEQ_LENGTH  # noqa: E402

assert PAIR_ID_BASE > _MAX_SEQ_LENGTH, "pair_id multiplier below record-length bound"

NRE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("rec_id", IntegerType(), False),
        StructField("pair_id", LongType(), False),
        StructField("token_ids", ArrayType(IntegerType()), False),
        StructField("att_mask", ArrayType(IntegerType()), False),
        StructField("pos_head", IntegerType(), False),
        StructField("pos_tail", IntegerType(), False),
    ]
)


def encode_pairs(pairs: DataFrame, max_length: int = 128) -> DataFrame:
    """pairs(url, rec_id, pair_id, text, h_start, h_end, t_start, t_end)
    → NRE model inputs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.nre import encode_pair
        from ..core.vocab import build_vocab

        vocab = build_vocab()
        for pdf in batches:
            rows = {k: [] for k in ("url", "rec_id", "pair_id", "token_ids", "att_mask", "pos_head", "pos_tail")}
            for r in pdf.itertuples(index=False):
                ids, mask, ph, pt = encode_pair(
                    r.text, (r.h_start, r.h_end), (r.t_start, r.t_end), max_length, vocab
                )
                rows["url"].append(r.url)
                rows["rec_id"].append(r.rec_id)
                rows["pair_id"].append(r.pair_id)
                rows["token_ids"].append(ids)
                rows["att_mask"].append(mask)
                rows["pos_head"].append(ph)
                rows["pos_tail"].append(pt)
            yield pd.DataFrame(
                {
                    "url": pd.Series(rows["url"], dtype=object),
                    "rec_id": pd.Series(rows["rec_id"], dtype="int32"),
                    "pair_id": pd.Series(rows["pair_id"], dtype="int64"),
                    "token_ids": pd.Series(rows["token_ids"], dtype=object),
                    "att_mask": pd.Series(rows["att_mask"], dtype=object),
                    "pos_head": pd.Series(rows["pos_head"], dtype="int32"),
                    "pos_tail": pd.Series(rows["pos_tail"], dtype="int32"),
                }
            )

    return pairs.mapInPandas(run, NRE_SCHEMA)


def mention_pairs(records_mentions: DataFrame) -> DataFrame:
    """Fused detect output → relation-candidate pairs.

    Same in-array pairing as emit_triples_narrow (no self-join): ordered
    mention pairs in one record with no sentence delimiter between
    them.  pair_id = h_start·PAIR_ID_BASE + t_start — unique per record
    because record texts are far shorter than PAIR_ID_BASE chars (the
    packer caps them at MAX_SEQ_LENGTH − 2 = 382; the module-level
    assert below keeps a future packing-limit change from silently
    violating the precondition) AND BIO-decoded mentions never overlap
    (two mentions cannot share a start_pos); callers feeding arbitrary
    overlapping spans must supply their own ids.
    → (url, rec_id, pair_id, text, h_start, h_end, t_start, t_end).
    """
    import pyspark.sql.functions as F

    from .triples import _DELIM_RE

    def _pair_ok(p):
        between = F.col("text").substr(
            p["m1"]["end_pos"] + 1, p["m2"]["start_pos"] - p["m1"]["end_pos"]
        )
        return (p["m1"]["start_pos"] < p["m2"]["start_pos"]) & ~between.rlike(
            _DELIM_RE
        )

    pair_expr = F.filter(
        F.flatten(
            F.transform(
                F.col("mentions"),
                lambda m1: F.transform(
                    F.col("mentions"),
                    lambda m2: F.struct(m1.alias("m1"), m2.alias("m2")),
                ),
            )
        ),
        _pair_ok,
    )
    return (
        records_mentions.withColumn("p", F.explode(pair_expr))
        .select(
            "url",
            "rec_id",
            (
                F.col("p.m1.start_pos").cast("long") * PAIR_ID_BASE
                + F.col("p.m2.start_pos").cast("long")
            ).alias("pair_id"),
            "text",
            F.col("p.m1.start_pos").alias("h_start"),
            F.col("p.m1.end_pos").alias("h_end"),
            F.col("p.m2.start_pos").alias("t_start"),
            F.col("p.m2.end_pos").alias("t_end"),
        )
    )


RELATION_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("rec_id", IntegerType(), False),
        StructField("pair_id", LongType(), False),
        StructField("predicate", StringType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def classify_relations(pairs: DataFrame, weights_bc) -> DataFrame:
    """M7: score candidate pairs with the hierarchical relation head
    (SoftmaxNN surrogate, models.py:31-41) — Arrow-batched, weights via
    broadcast.  → (url, rec_id, pair_id, predicate, score).

    Input is the ``mention_pairs`` table (url, rec_id, pair_id, text,
    h_start, h_end, t_start, t_end).  Pairs are grouped per record
    inside each Arrow batch so all of a record's pairs share ONE encode
    of the record text (core/nre.record_pair_features) — the per-pair
    re-encode was the memory-bandwidth wall at 32 workers.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.artifacts import nre_relation_labels
        from ..core.nre import classify_pairs, record_pair_features
        from ..core.vocab import build_vocab

        weights = weights_bc.value
        labels = nre_relation_labels()
        vocab = build_vocab()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_url, out_rec, out_pid, out_pred, out_score = [], [], [], [], []
            for (url, rec_id), g in pdf.groupby(["url", "rec_id"], sort=False):
                text = g["text"].iloc[0]
                prs = list(
                    zip(g["h_start"], g["h_end"], g["t_start"], g["t_end"])
                )
                feats = record_pair_features(text, prs, weights, vocab)
                pred, prob = classify_pairs(feats, weights)
                out_url += [url] * len(g)
                out_rec += [rec_id] * len(g)
                out_pid += list(g["pair_id"])
                out_pred += [labels[i] for i in pred]
                out_score += list(prob)
            yield pd.DataFrame(
                {
                    "url": pd.Series(out_url, dtype=object),
                    "rec_id": pd.Series(out_rec, dtype="int32"),
                    "pair_id": pd.Series(out_pid, dtype="int64"),
                    "predicate": pd.Series(out_pred, dtype=object),
                    "score": pd.Series(out_score, dtype="float64"),
                }
            )

    return pairs.mapInPandas(run, RELATION_SCHEMA)


def classify_relations_fused(records_mentions: DataFrame, weights_bc) -> DataFrame:
    """``classify_relations`` ∘ ``mention_pairs`` WITHOUT the explode
    (r06): the in-array pairing stays narrow and each record crosses
    the Arrow boundary ONCE with its pair list, where the exploded
    shape shipped the full record text per pair (~150× serialization
    amplification at the fixture's pair density) and re-grouped rows
    pandas-side.  Output rows and values are identical — the same
    pairing expression builds the pair list in the same order, and the
    kernel feeds record_pair_features/classify_pairs the same
    (text, pairs) inputs; parity is pytest-asserted
    (tests/test_nre_relations.py::test_classify_relations_fused_matches_exploded).
    """
    import pyspark.sql.functions as F

    from .triples import _DELIM_RE

    def _pair_ok(p):
        between = F.col("text").substr(
            p["m1"]["end_pos"] + 1, p["m2"]["start_pos"] - p["m1"]["end_pos"]
        )
        return (p["m1"]["start_pos"] < p["m2"]["start_pos"]) & ~between.rlike(
            _DELIM_RE
        )

    pair_expr = F.filter(
        F.flatten(
            F.transform(
                F.col("mentions"),
                lambda m1: F.transform(
                    F.col("mentions"),
                    lambda m2: F.struct(m1.alias("m1"), m2.alias("m2")),
                ),
            )
        ),
        _pair_ok,
    )
    prs_expr = F.transform(
        pair_expr,
        lambda p: F.struct(
            p["m1"]["start_pos"].alias("h_start"),
            p["m1"]["end_pos"].alias("h_end"),
            p["m2"]["start_pos"].alias("t_start"),
            p["m2"]["end_pos"].alias("t_end"),
        ),
    )
    recs = records_mentions.select(
        "url", "rec_id", "text", prs_expr.alias("prs")
    ).filter(F.size("prs") > 0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.artifacts import nre_relation_labels
        from ..core.nre import classify_pairs, record_pair_features
        from ..core.vocab import build_vocab

        weights = weights_bc.value
        labels = nre_relation_labels()
        vocab = build_vocab()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_url, out_rec, out_pid, out_pred, out_score = [], [], [], [], []
            for url, rec_id, text, prs in zip(
                pdf["url"], pdf["rec_id"], pdf["text"], pdf["prs"]
            ):
                tuples = [
                    (
                        int(p["h_start"]),
                        int(p["h_end"]),
                        int(p["t_start"]),
                        int(p["t_end"]),
                    )
                    for p in prs
                ]
                feats = record_pair_features(text, tuples, weights, vocab)
                pred, prob = classify_pairs(feats, weights)
                out_url += [url] * len(tuples)
                out_rec += [rec_id] * len(tuples)
                out_pid += [
                    hs * PAIR_ID_BASE + ts for hs, _he, ts, _te in tuples
                ]
                out_pred += [labels[i] for i in pred]
                out_score += list(prob)
            yield pd.DataFrame(
                {
                    "url": pd.Series(out_url, dtype=object),
                    "rec_id": pd.Series(out_rec, dtype="int32"),
                    "pair_id": pd.Series(out_pid, dtype="int64"),
                    "predicate": pd.Series(out_pred, dtype=object),
                    "score": pd.Series(out_score, dtype="float64"),
                }
            )

    return recs.mapInPandas(run, RELATION_SCHEMA)


def bag_relations(scored: DataFrame, linked: DataFrame) -> DataFrame:
    """Bag-level (multi-instance) relation aggregation — the engine
    analog of the reference's ``PCNNAttnNREModel`` wrapping
    ``opennre.model.BagAttention`` (nremodels/models.py:78, benched in
    test/albertNRE/run_pcnn_attn.py:44-66): relation evidence is pooled
    over the BAG of sentences mentioning the same (head, tail) entity
    pair, not judged per sentence.

    ``scored``: per-sentence pair scores (classify_relations output —
    url, rec_id, pair_id, predicate, score).  ``linked``: linked
    mentions (url, rec_id, start_pos, ..., entity_id).  pair_id
    decomposes back into (h_start, t_start), each joined to its linked
    mention's entity id; unlinked mentions drop out (no entity → no
    bag), mirroring how bag construction needs resolved arguments.

    Pooling is the attention shape: weight_i = softmax over the bag of
    the instance scores, bag_score = Σ softmax(s_i)·s_i — plus the
    max-pool alternative (``max_score``) and the bag size.  All
    aggregation is one Catalyst groupBy on the bag key — at scale the
    bag table shuffles once on (subj, obj, predicate), with map-side
    partial aggregation of the three running sums; no Python.
    """
    import pyspark.sql.functions as F

    h = linked.select(
        "url",
        "rec_id",
        F.col("start_pos").alias("h_start"),
        F.col("entity_id").alias("subj_id"),
    )
    t = linked.select(
        "url",
        "rec_id",
        F.col("start_pos").alias("t_start"),
        F.col("entity_id").alias("obj_id"),
    )
    pairs = scored.withColumn(
        "h_start", F.floor(F.col("pair_id") / PAIR_ID_BASE).cast("int")
    ).withColumn("t_start", F.pmod(F.col("pair_id"), F.lit(PAIR_ID_BASE)).cast("int"))
    return (
        pairs.join(h, ["url", "rec_id", "h_start"])
        .join(t, ["url", "rec_id", "t_start"])
        .groupBy("subj_id", "obj_id", "predicate")
        .agg(
            F.count("*").alias("n_sentences"),
            (
                F.sum(F.exp("score") * F.col("score")) / F.sum(F.exp("score"))
            ).alias("bag_score"),
            F.max("score").alias("max_score"),
        )
    )
