"""M1+M2: encoder + CRF-Viterbi mention detection as one mapInPandas stage.

The Spark re-expression of the reference's serving path
(ner_server.py:11-27 → crf_albert.py:209-226): featurize → encode →
decode → recover tags → mention spans, fused into ONE Arrow-batched
``mapInPandas`` stage so features never hit a shuffle and inputs stay
keyed (no order-based zip — the reference's J5 trap, ner_server.py:16-19).

Scale design:
- model weights ship via ``sc.broadcast`` once (the warm-start analog,
  crf_albert.py:199-206); each Python worker deserializes once thanks to
  broadcast-value caching.
- compute is batch-vectorized numpy over the Arrow batch (batch size
  bounded by spark.sql.execution.arrow.maxRecordsPerBatch), trimmed to
  the batch's max real length — the reference pads everything to 384
  (crf_utils.py:185-198); we keep rectangular batches but avoid padded
  matmul work.
- 1→N row fan-out (record → mentions) makes this UDTF-shaped, hence
  mapInPandas rather than a scalar UDF (SURVEY.md §2.10).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MENTIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("rec_id", IntegerType(), False),
        StructField("start_pos", IntegerType(), False),
        StructField("end_pos", IntegerType(), False),
        StructField("label_type", StringType(), False),
        StructField("surface", StringType(), False),
    ]
)


def detect_mentions(records: DataFrame, weights_bc) -> DataFrame:
    """records(url, rec_id, text) → mentions(url, rec_id, start, end, type, surface).

    ``weights_bc``: a ``Broadcast[dict[str, np.ndarray]]`` of the
    surrogate model weights (core.artifacts.get_weights()).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..core.bio import tags_to_mentions
        from ..core.featurize import convert_single_example, recover_tags
        from ..core.labels import INV_LABEL_MAP
        from ..core.model import encode_logits_trimmed, viterbi_decode
        from ..core.vocab import build_vocab

        weights = weights_bc.value
        vocab = build_vocab()

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                convert_single_example(t if t is not None else "", vocab=vocab)
                for t in pdf["text"]
            ]
            input_ids = np.asarray([f[0] for f in feats], dtype=np.int64)
            lengths = np.asarray([sum(f[1]) for f in feats], dtype=np.int64)
            tmax = int(lengths.max())
            logits = encode_logits_trimmed(input_ids, tmax, weights)
            paths = viterbi_decode(logits, lengths, weights["trans"])

            urls, rids, ss, es, labs, surfs = [], [], [], [], [], []
            for row_i, (url, rid, text) in enumerate(
                zip(pdf["url"], pdf["rec_id"], pdf["text"])
            ):
                tags = recover_tags(
                    paths[row_i].tolist(), input_ids[row_i].tolist(), INV_LABEL_MAP
                )
                for label, s, e in tags_to_mentions(tags):
                    urls.append(url)
                    rids.append(rid)
                    ss.append(s)
                    es.append(e)
                    labs.append(label)
                    surfs.append(text[s:e])
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "rec_id": pd.Series(rids, dtype="int32"),
                    "start_pos": pd.Series(ss, dtype="int32"),
                    "end_pos": pd.Series(es, dtype="int32"),
                    "label_type": pd.Series(labs, dtype=object),
                    "surface": pd.Series(surfs, dtype=object),
                }
            )

    return records.mapInPandas(run, MENTIONS_SCHEMA)
