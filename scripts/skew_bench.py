#!/usr/bin/env python
"""Planted-skew bench for the salted entity-linking join (BENCH/skew.md).

Round-2 verdict item 7: link.py's ``salted=True`` path was
parity-tested but never exercised under an actual Zipfian hot key.
This bench plants one surface covering ~40% of all mentions and times
the dictionary join three ways at local[8] (the operating point where
the dictionary has outgrown broadcast — ``autoBroadcastJoinThreshold``
is disabled so the join actually shuffles):

1. naive shuffle join (AQE skew-join OFF) — the hot key's partition is
   one straggler task doing ~40% of the probe work alone;
2. AQE skew-join (Spark's runtime mitigation) — the planner splits the
   oversized partition after seeing map statistics;
3. explicit salting (operators/link.py:link_mentions(salted=True)) —
   the mention side salts ``n_salt`` ways and the dictionary side
   replicates, so the hot key is ``n_salt`` balanced partitions by
   construction (works even where AQE cannot see the skew, e.g.
   pre-aggregated inputs or non-SMJ plans).

Each timing is min-of-N (this VM's 2-6× steal noise only ever ADDS
time).  Surfaces are letter-encoded — digit-bearing keys would collide
under the digit-normalization convention (link.normalize_surface).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MENTIONS = 24_000_000
N_DICT = 50_000
HOT_FRACTION = 0.4
N_SALT = 8
REPEATS = int(os.environ.get("SPARKKG_SKEW_REPEATS", "3"))

def build_inputs(spark):
    import pyspark.sql.functions as F

    dic = spark.range(N_DICT).select(
        F.col("id").alias("entity_id"),
        F.concat(
            F.lit("s"), F.translate(F.col("id").cast("string"), "0123456789", "abcdefghij")
        ).alias("canonical_name"),
        F.array().cast("array<string>").alias("aliases"),
        F.lit("T").alias("label_type"),
        F.array(F.lit(0.0)).cast("array<float>").alias("embedding"),
        F.lit(False).alias("is_head"),
    )
    hot_cut = int(HOT_FRACTION * 100)
    mentions = spark.range(N_MENTIONS).select(
        F.concat(F.lit("u"), (F.col("id") % 1000).cast("string")).alias("url"),
        F.lit(0).alias("rec_id"),
        F.col("id").cast("int").alias("start_pos"),
        (F.col("id") + 2).cast("int").alias("end_pos"),
        F.lit("T").alias("label_type"),
        F.when(
            F.pmod(F.hash("id"), F.lit(100)) < hot_cut, F.lit("shot")
        )
        .otherwise(
            F.concat(
                F.lit("s"),
                F.translate(
                    F.pmod(F.hash("id", F.lit(7)), F.lit(N_DICT)).cast("string"),
                    "0123456789",
                    "abcdefghij",
                ),
            )
        )
        .alias("surface"),
    )
    # the hot surface must resolve: give it a dictionary row
    hot_row = spark.createDataFrame(
        [(N_DICT, "shot", [], "T", [0.0], True)], dic.schema
    )
    return mentions, dic.unionByName(hot_row)


def timed(fn) -> float:
    best = None
    for _ in range(REPEATS):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from knowledgeextraction_spark.operators.link import link_mentions, surface_dictionary
    from knowledgeextraction_spark.session import get_spark

    os.environ.setdefault("SPARKKG_LOCAL_DIR", "/dev/shm/sparkkg-tmp")
    spark = get_spark("sparkkg-skew", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # the scenario: dictionary has outgrown broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    mentions, entities = build_inputs(spark)
    mentions = mentions.localCheckpoint(eager=True)  # inputs untimed
    entities = entities.localCheckpoint(eager=True)
    dic = surface_dictionary(entities).withColumnRenamed("label_type", "dict_label")
    dic = dic.localCheckpoint(eager=True)

    def naive():
        m = mentions.withColumn(
            "norm_surface", F.regexp_replace("surface", r"\d", "0")
        )
        j = m.join(dic, m.norm_surface == dic.surface).filter(
            F.col("label_type") == F.col("dict_label")
        )
        j.write.format("noop").mode("overwrite").save()

    def run_salted():
        link_mentions(mentions, entities, salted=True, n_salt=N_SALT).write.format(
            "noop"
        ).mode("overwrite").save()

    # 1. naive shuffle join, AQE skew mitigation off
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_naive = timed(naive)
    # 2. AQE skew-join on
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
    )
    t_aqe = timed(naive)
    # 3. explicit salting (AQE skew-join off so the effect is salting's own)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_salted = timed(run_salted)
    spark.stop()

    md = f"""# BENCH/skew — salted linking join under a planted hot key

Input: {N_MENTIONS:,} mentions, one surface covering ~{int(HOT_FRACTION*100)}%
of them, {N_DICT:,}-surface dictionary, local[8], broadcast disabled
(`autoBroadcastJoinThreshold=-1` — the dictionary-outgrew-broadcast
scenario the salted path exists for), min-of-{REPEATS} per row.

| strategy | wall (s) | vs naive |
|---|---|---|
| naive shuffle join (AQE skew-join off) | {t_naive:.2f} | 1.00× |
| AQE skew-join (runtime split) | {t_aqe:.2f} | {t_naive / t_aqe:.2f}× |
| explicit salting (link_mentions salted=True, n_salt={N_SALT}) | {t_salted:.2f} | {t_naive / t_salted:.2f}× |

Reading: the hot key makes the naive join a single-straggler plan
(~{int(HOT_FRACTION*100)}% of probe work on one of 8 cores); balancing
it buys {t_naive / t_salted:.2f}× (salted) / {t_naive / t_aqe:.2f}×
(AQE) here rather than the naive-count prediction because the
balanced plan immediately hits this VM's ~8-core memory-bandwidth
ceiling (BENCH/BASELINE.md) — on a real cluster the straggler's
stage-wall dominance grows with data volume.  AQE's
skew-join splits the oversized partition at runtime and is the first
line of defense; explicit salting reaches the same balance by
construction and also covers the cases AQE cannot see (skewed
pre-aggregated inputs, non-sort-merge plans, or joins feeding a
stateful stage).  The production default remains broadcast (skew-
irrelevant); salting is the documented fallback when the dictionary
outgrows broadcast (link.py module docstring).

Regenerate: `python scripts/skew_bench.py` (writes this file).
"""
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "skew.md"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
