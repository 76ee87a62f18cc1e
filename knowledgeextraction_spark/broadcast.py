"""Session-scoped broadcast cache for the model weights.

Each new ``sc.broadcast`` id makes every python worker re-fetch,
re-unpickle, and re-fold the weight tables (~8 s across 32 workers per
broadcast at local[32]); queries that run in the same session must
share one broadcast — the exact analog of the reference loading the
checkpoint once per process (crf_albert.py:199-206).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_CACHE: dict[int, object] = {}


def weights_broadcast(spark: SparkSession):
    from .core.artifacts import get_weights

    sc = spark.sparkContext
    key = id(sc)
    bc = _CACHE.get(key)
    if bc is None:
        _CACHE.clear()
        bc = sc.broadcast(get_weights())
        _CACHE[key] = bc
    return bc
