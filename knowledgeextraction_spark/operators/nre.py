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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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
