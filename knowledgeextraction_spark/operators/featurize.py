"""F11: vectorized char featurizer (crf_utils.py:72-220 semantics).

Exposed as a standalone operator mainly for parity testing and for
pipelines that materialize a feature table (the reference's TFRecord
cache stage, crf_utils.py:276-307 → a parquet/Iceberg stage table
here). The detect stage fuses featurization into its mapInPandas to
avoid materializing 384-int vectors through a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

FEATURES_TYPE = StructType(
    [
        StructField("input_ids", ArrayType(IntegerType()), False),
        StructField("input_mask", ArrayType(IntegerType()), False),
        StructField("segment_ids", ArrayType(IntegerType()), False),
    ]
)


@pandas_udf(FEATURES_TYPE)
def featurize_udf(text: pd.Series) -> pd.DataFrame:
    from ..core.featurize import convert_single_example
    from ..core.vocab import build_vocab

    vocab = build_vocab()
    ids, masks, segs = [], [], []
    for t in text:
        i, m, s, _l = convert_single_example(t if t is not None else "", vocab=vocab)
        ids.append(i)
        masks.append(m)
        segs.append(s)
    return pd.DataFrame({"input_ids": ids, "input_mask": masks, "segment_ids": segs})


def featurized(records: DataFrame, text_col: str = "text") -> DataFrame:
    """records(url, rec_id, text) → + input_ids/input_mask/segment_ids."""
    return records.withColumn("f", featurize_udf(F.col(text_col))).select(
        "*", "f.input_ids", "f.input_mask", "f.segment_ids"
    ).drop("f")
