"""M8/M9: mention pairing + rule-based triple emission.

The reference's entity-pair generation is dead code
(mrc_gen_taggers.py:4-19, empty loop body) and its NRE path scores
pre-paired (sentence, head, tail) items row-at-a-time (models.py:10-18);
[NORTH] replaces the model with rule-based relation emission. Semantics:
for linked mentions m1, m2 in the same packed record with
``m1.start_pos < m2.start_pos``, both in the same sentence (no sentence
delimiter between them), emit (subj, pred, obj) when a rule for
(m1.label_type, m2.label_type) exists whose connective ``pattern``
occurs in the between-text.

Scale design:
- the self-join shuffles both sides on (url, rec_id) — co-partitioned
  by construction, and record keys are near-unique so there is no skew;
  AQE handles residual imbalance.
- rules are a tiny dimension → ``broadcast()``.
- the between-text comes from re-joining the records table on the same
  (url, rec_id) key — again co-partitioned, one shuffle reused across
  both joins (Exchange reuse).
- everything is Catalyst expressions (substring/instr/locate) — no
  Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference delimiter set (text_segment.py:27): '；' '，' '？' '。'
# '！' and the TWO-character ellipsis '……' — a lone '…' is NOT a sentence
# delimiter in the reference.  Single source of truth shared with the
# numpy oracle (oracle/pipeline.py) so the Spark regex and the oracle's
# substring check can never diverge.
DELIMITERS = ("；", "，", "？", "。", "！", "……")
_DELIM_RE = "|".join(DELIMITERS)


def emit_triples(
    linked_mentions: DataFrame,
    records: DataFrame,
    rules: DataFrame,
) -> DataFrame:
    """→ (subj_id, predicate, obj_id, url, rec_id) distinct.

    linked_mentions: (url, rec_id, start_pos, end_pos, label_type,
    surface, entity_id); records: (url, rec_id, text); rules:
    (subj_label, obj_label, pattern, predicate).
    """
    m1 = linked_mentions.select(
        "url",
        "rec_id",
        F.col("start_pos").alias("s1"),
        F.col("end_pos").alias("e1"),
        F.col("label_type").alias("t1"),
        F.col("entity_id").alias("subj_entity"),
    )
    m2 = linked_mentions.select(
        "url",
        "rec_id",
        F.col("start_pos").alias("s2"),
        F.col("end_pos").alias("e2"),
        F.col("label_type").alias("t2"),
        F.col("entity_id").alias("obj_entity"),
    )

    pairs = m1.join(m2, ["url", "rec_id"]).filter(F.col("s1") < F.col("s2"))

    with_text = pairs.join(records.select("url", "rec_id", "text"), ["url", "rec_id"])
    with_between = with_text.withColumn(
        "between", F.expr("substring(text, e1 + 1, s2 - e1)")
    ).filter(~F.col("between").rlike(_DELIM_RE))

    out = (
        with_between.join(
            F.broadcast(rules),
            (F.col("t1") == F.col("subj_label")) & (F.col("t2") == F.col("obj_label")),
            "inner",
        )
        .filter(F.instr(F.col("between"), F.col("pattern")) > 0)
        .select(
            F.col("subj_entity").alias("subj_id"),
            "predicate",
            F.col("obj_entity").alias("obj_id"),
            "url",
            "rec_id",
        )
        .distinct()
    )
    return out


def canonicalized_triples(triples: DataFrame, component_map: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonicalization map (M10 output).

    component_map: (entity_id, canonical_id). Two broadcast joins —
    the map is dimension-sized (SURVEY.md §7 stage 3).
    """
    subj_map = component_map.withColumnRenamed("entity_id", "subj_id").withColumnRenamed(
        "canonical_id", "subj_canon"
    )
    obj_map = component_map.withColumnRenamed("entity_id", "obj_id").withColumnRenamed(
        "canonical_id", "obj_canon"
    )
    return (
        triples.join(F.broadcast(subj_map), "subj_id", "left")
        .join(F.broadcast(obj_map), "obj_id", "left")
        .select(
            F.coalesce("subj_canon", "subj_id").alias("subj_id"),
            "predicate",
            F.coalesce("obj_canon", "obj_id").alias("obj_id"),
            "url",
            "rec_id",
        )
        .distinct()
    )


def emit_triples_narrow(
    records_mentions: DataFrame,
    rules: DataFrame,
    entities: DataFrame,
    component_map: DataFrame,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """Shuffle-minimal triple emission from the fused detect output.

    ``records_mentions``: (url, rec_id, text, mentions array<struct>) —
    the detect stage's nested output. Because a record's mentions are
    already co-located in one array, the M8 pairing needs NO self-join:
    pairs are generated and delimiter-filtered inside the array
    (transform×transform → filter → explode), which is a narrow map.
    Rules, the entity dictionary, and the canonicalization map are all
    dimension tables → broadcast joins. The ONLY shuffle in the whole
    pages→triples plan is the final ``distinct``.

    At 10^12 pages this is the plan that survives: the fact table never
    shuffles until it has been reduced to (subj, pred, obj, url, rec)
    tuples.

    Mention surfaces are digit-normalized (link.normalize_surface)
    before the dictionary joins — the same convention the granular path
    applies in link_mentions (link.py) and the dictionary itself applies
    in surface_dictionary, so a digit-bearing alias links identically
    through either plan.
    """
    from .link import normalize_surface, surface_dictionary

    def _pair_ok(p):
        between = F.col("text").substr(
            p["m1"]["end_pos"] + 1, p["m2"]["start_pos"] - p["m1"]["end_pos"]
        )
        return (p["m1"]["start_pos"] < p["m2"]["start_pos"]) & ~between.rlike(
            _DELIM_RE
        )

    pair_expr = F.filter(
        F.flatten(
            F.transform(
                F.col("mentions"),
                lambda m1: F.transform(
                    F.col("mentions"), lambda m2: F.struct(m1.alias("m1"), m2.alias("m2"))
                ),
            )
        ),
        _pair_ok,
    )

    pairs = (
        records_mentions.withColumn("p", F.explode(pair_expr))
        .select(
            "url",
            "rec_id",
            F.expr("substring(text, p.m1.end_pos + 1, p.m2.start_pos - p.m1.end_pos)").alias(
                "between"
            ),
            F.col("p.m1.label_type").alias("t1"),
            normalize_surface(F.col("p.m1.surface")).alias("surf1"),
            F.col("p.m2.label_type").alias("t2"),
            normalize_surface(F.col("p.m2.surface")).alias("surf2"),
        )
    )

    with_rules = pairs.join(
        F.broadcast(rules),
        (F.col("t1") == F.col("subj_label")) & (F.col("t2") == F.col("obj_label")),
        "inner",
    ).filter(F.instr(F.col("between"), F.col("pattern")) > 0)

    # ``dictionary``: an optional prebuilt (surface, label_type,
    # entity_id) frame — a caller whose dictionary is driver-resident
    # (link.surface_dictionary_rows) passes a local relation and skips
    # the explode+groupBy sub-DAG under each broadcast build (r06)
    dic = dictionary if dictionary is not None else surface_dictionary(entities)
    subj_dic = dic.select(
        F.col("surface").alias("surf1"),
        F.col("label_type").alias("t1"),
        F.col("entity_id").alias("subj_entity"),
    )
    obj_dic = dic.select(
        F.col("surface").alias("surf2"),
        F.col("label_type").alias("t2"),
        F.col("entity_id").alias("obj_entity"),
    )
    linked = with_rules.join(F.broadcast(subj_dic), ["surf1", "t1"]).join(
        F.broadcast(obj_dic), ["surf2", "t2"]
    )

    subj_map = component_map.withColumnRenamed("entity_id", "subj_entity").withColumnRenamed(
        "canonical_id", "subj_canon"
    )
    obj_map = component_map.withColumnRenamed("entity_id", "obj_entity").withColumnRenamed(
        "canonical_id", "obj_canon"
    )
    return (
        linked.join(F.broadcast(subj_map), "subj_entity", "left")
        .join(F.broadcast(obj_map), "obj_entity", "left")
        .select(
            F.coalesce("subj_canon", "subj_entity").alias("subj_id"),
            "predicate",
            F.coalesce("obj_canon", "obj_entity").alias("obj_id"),
            "url",
            "rec_id",
        )
        .distinct()
    )
