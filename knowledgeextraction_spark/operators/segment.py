"""F1/F2 sentence segmentation + W3 greedy packing, as Spark operators.

- ``sentences_udf``: text → array<string> via the exact reference
  splitter semantics (core.textops.to_sentences; text_segment.py:24-38).
  A scalar pandas UDF returning an array — ``split()`` + ``posexplode``
  can't keep delimiters attached nor run the quote-merge, so this is the
  designated slow-path UDF (SURVEY.md §2.7 F1).
- ``pack_udf``: text → array<struct<rec_id,text>>. The greedy packing is
  a pure per-document function, so it does NOT need a groupBy shuffle:
  one narrow UDF + ``posexplode`` replaces the reference's stateful
  ExampleSementer (crf_gen_taggers.py:49-88). Zero shuffles for the
  whole extract→segment→pack prefix of the pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

_REC_TYPE = ArrayType(
    StructType(
        [
            StructField("rec_id", IntegerType(), False),
            StructField("text", StringType(), False),
        ]
    )
)


@pandas_udf(ArrayType(StringType()))
def sentences_udf(text: pd.Series) -> pd.Series:
    from ..core.textops import to_sentences

    return pd.Series([to_sentences(t) if t is not None else [] for t in text])


def _make_pack_udf(max_seq_length: int):
    @pandas_udf(_REC_TYPE)
    def pack_udf(text: pd.Series) -> pd.Series:
        from ..core.packing import pack_sentences

        out = []
        for t in text:
            if t is None:
                out.append([])
            else:
                out.append(
                    [
                        {"rec_id": i, "text": rec_text}
                        for i, (rec_text, _e) in enumerate(
                            pack_sentences(t, [], max_seq_length)
                        )
                    ]
                )
        return pd.Series(out)

    return pack_udf


def packed_records(
    pages: DataFrame, max_seq_length: int = 382, text_col: str = "text"
) -> DataFrame:
    """pages(url, text, ...) → records(url, rec_id, text).

    Narrow (no shuffle): pack per page inside the UDF, then explode.
    """
    pack_udf = _make_pack_udf(max_seq_length)
    return (
        pages.select("url", pack_udf(F.col(text_col)).alias("recs"))
        .select("url", F.explode("recs").alias("rec"))
        .select("url", F.col("rec.rec_id").alias("rec_id"), F.col("rec.text").alias("text"))
    )


def sentence_table(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages → (url, sent_id, sentence) via posexplode (order preserved)."""
    return pages.select(
        "url", F.posexplode(sentences_udf(F.col(text_col))).alias("sent_id", "sentence")
    )
