"""Session-scoped broadcast cache for the model weights.

Each new ``sc.broadcast`` id makes every python worker re-fetch,
re-unpickle, and re-fold the weight tables (~8 s across 32 workers per
broadcast at local[32]); queries that run in the same session must
share one broadcast — the exact analog of the reference loading the
checkpoint once per process (crf_albert.py:199-206).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_CACHE: dict[tuple[int, str], object] = {}


def _cached_broadcast(spark: SparkSession, name: str, loader):
    sc = spark.sparkContext
    key = (id(sc), name)
    bc = _CACHE.get(key)
    if bc is None:
        for k in [k for k in _CACHE if k[0] != id(sc)]:
            del _CACHE[k]
        bc = sc.broadcast(loader())
        _CACHE[key] = bc
    return bc


def weights_broadcast(spark: SparkSession):
    from .core.artifacts import get_weights

    return _cached_broadcast(spark, "crf", get_weights)


def mrc_weights_broadcast(spark: SparkSession):
    """Encoder + MRC span-head weights (core/artifacts.get_mrc_weights)."""
    from .core.artifacts import get_mrc_weights

    return _cached_broadcast(spark, "mrc", get_mrc_weights)


def nre_weights_broadcast(spark: SparkSession):
    """Encoder + NRE relation-head weights (core/artifacts.get_nre_weights)."""
    from .core.artifacts import get_nre_weights

    return _cached_broadcast(spark, "nre", get_nre_weights)
