"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``knowledgeextraction_spark.queries``; every
registered query carries an oracle — closed-form DuckDB SQL where the
semantics are SQL-expressible, committed golden parquet from the
independent single-node numpy oracle (``oracle/``) for the model-based
stages and the distributed fit, with exact-parity pytest gates behind
both (tests/test_spark_pipeline.py, tests/test_docworld_golden.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline (extract → segment →
    detect → link → canonicalize → triples) on sf0.001."""
    from knowledgeextraction_spark.queries import q_kg_triples

    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from knowledgeextraction_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from knowledgeextraction_spark.queries import ORACLES

    return dict(ORACLES)
