"""Multimodal columns: binary payloads + typed metadata (plumbing).

Image/audio/video are opaque ``binary`` columns with a metadata struct;
decode/resize/frame-sample run as Arrow-batched ``mapInPandas`` stages.
The actual codec step is STUBBED (no image/audio libs in this
container): ``decode_stub=True`` produces a deterministic fake feature
vector from the bytes (md5-seeded), with the Spark-side plumbing —
schema, batch shape, partitioning — real and tested. Swap the stub for
PIL/torchaudio by replacing ``_decode_payload`` only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", StringType(), False),  # binary in prod; str here
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 8


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    """STUB decode: deterministic fake features from the payload bytes.

    Real implementation would be: PIL.Image.open → resize → pixel
    stats (image), torchaudio.load → spectrogram (audio), frame-sample
    + per-frame decode (video). Raise if a real codec is demanded:
    ``raise NotImplementedError`` path kept for clarity.
    """
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload, ...) → (media_id, kind, n_bytes, feature).

    mapInPandas keeps the (potentially large) payload column out of any
    shuffle: decode happens on the scan partition, only the small
    feature vector flows downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else str(p).encode("utf-8")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "feature": [
                        _decode_payload(p, k) for p, k in zip(payloads, pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
