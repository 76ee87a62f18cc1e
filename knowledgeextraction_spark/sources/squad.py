"""S3: SQuAD-style nested-JSON source.

The reference reads MRC training data as JSON LINES, each line one
paragraph record ``{context, qas: [{id, question, is_impossible,
answers: [{text, answer_start}]}]}`` and flattens every (paragraph,
qa) into a SquadExample (``mrc_utils.py:466-526``; training rule
:505-514: exactly one answer when possible, ``start=-1, text=''`` when
impossible).

Spark-first re-expression: ``spark.read.json`` with an explicit nested
schema (no sampling-based inference pass over 100 TB) + ``explode(qas)``
— the flatten is pure Catalyst, and the scan prunes to the queried
struct fields (ReadSchema shows only context/qas).

``write_squad_jsonl`` derives a deterministic SQuAD-shaped corpus from
the driver's documents table (two questions per document; the second is
``is_impossible`` when the document has fewer than five words), so the
DuckDB oracle can recompute the flattened output directly from
``documents`` — the round-trip through the written JSONL is exactly
what the query verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SQUAD_SCHEMA = StructType(
    [
        StructField("context", StringType(), True),
        StructField(
            "qas",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType(), True),
                        StructField("question", StringType(), True),
                        StructField("is_impossible", BooleanType(), True),
                        StructField(
                            "answers",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("text", StringType(), True),
                                        StructField("answer_start", LongType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)


def write_squad_jsonl(spark: SparkSession, sf_dir: str, path: str) -> None:
    """documents.parquet → SQuAD-shaped JSON lines at ``path``.

    Per document: context = trim(text); qa1 asks for the first word
    (answer_start 0); qa2 asks for the fifth word — impossible (empty
    answers) when the document has fewer than five words.  All offsets
    are single-space word joins, matching the document text layout.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.trim("text"), " ")
    first_qa = F.struct(
        F.concat(F.lit("q"), F.col("doc_id").cast("string"), F.lit("_first")).alias("id"),
        F.lit("first word").alias("question"),
        F.lit(False).alias("is_impossible"),
        F.array(
            F.struct(
                F.element_at(w, 1).alias("text"),
                F.lit(0).cast("long").alias("answer_start"),
            )
        ).alias("answers"),
    )
    fifth_possible = F.size(w) >= 5
    fifth_qa = F.struct(
        F.concat(F.lit("q"), F.col("doc_id").cast("string"), F.lit("_fifth")).alias("id"),
        F.lit("fifth word").alias("question"),
        (~fifth_possible).alias("is_impossible"),
        F.when(
            fifth_possible,
            F.array(
                F.struct(
                    F.element_at(w, 5).alias("text"),
                    (F.length(F.array_join(F.slice(w, 1, 4), " ")) + 1)
                    .cast("long")
                    .alias("answer_start"),
                )
            ),
        )
        .otherwise(F.array().cast("array<struct<text:string,answer_start:bigint>>"))
        .alias("answers"),
    )
    (
        docs.select(
            F.trim("text").alias("context"),
            F.array(first_qa, fifth_qa).alias("qas"),
        )
        .write.mode("overwrite")
        .json(path)
    )


def read_squad_examples(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → flattened examples, the SquadExample training semantics
    (mrc_utils.py:505-519): one row per (paragraph, qa); impossible
    questions carry ``answer_start = -1`` and empty answer text.

    ``answer_ok`` asserts the offset invariant in-band:
    ``substring(context, answer_start) == answer text`` for every
    possible question (the check read_squad_examples leaves to the
    featurizer).
    """
    raw = spark.read.schema(SQUAD_SCHEMA).json(path)
    qa = raw.select("context", F.explode("qas").alias("qa"))
    ans = F.element_at(F.col("qa.answers"), 1)
    imp = F.col("qa.is_impossible")
    answer_text = F.when(imp, F.lit("")).otherwise(ans["text"])
    answer_start = F.when(imp, F.lit(-1).cast("long")).otherwise(
        ans["answer_start"].cast("long")
    )
    return qa.select(
        F.col("qa.id").alias("qas_id"),
        F.col("qa.question").alias("question"),
        answer_text.alias("answer_text"),
        answer_start.alias("answer_start"),
        imp.alias("is_impossible"),
        F.when(imp, F.lit(True))
        .otherwise(
            F.expr(
                "substring(context, qa.answers[0].answer_start + 1,"
                " length(qa.answers[0].text))"
            )
            == ans["text"]
        )
        .alias("answer_ok"),
    )
