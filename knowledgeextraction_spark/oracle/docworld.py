"""Spark-independent numpy oracle for the documents-derived world.

The flagship queries (``kg_mentions`` / ``kg_linked`` / ``kg_triples``)
run the surrogate NER model, so no closed-form SQL can reproduce them.
This module computes the same results INDEPENDENTLY — pure
numpy/python, no Spark — over the driver's ``documents.parquet``, and
materializes them as golden parquet files that the DuckDB correctness
oracle reads back with ``read_parquet``.  That converts the driver's
``no_oracle`` rows into real cross-implementation checks: a Spark-side
regression in extraction, packing, featurization, Viterbi, linking,
canonicalization, or pairing shows up as a golden mismatch.

Semantics mirrored (each asserted pairwise in tests):
- records: transliterated zh documents, one packed record per page
  (doc-world texts < 382 chars — queries.sql_kg_records is the same
  closed form),
- mentions: oracle.pipeline.detect_mentions (shared-weights encoder +
  Viterbi, the same numpy path pytest uses as ground truth),
- linked: operators/link.py semantics — digit-normalized surfaces, one
  dictionary row per (surface, label_type) keyed to min(entity_id),
  inner join with label-type agreement,
- triples: operators/triples.py semantics — ordered same-record pairs,
  no DELIMITERS in the between-text, broadcast rule match, component
  canonicalization (operators/canonicalize.py min-reachable-id).
"""

from __future__ import annotations

import os
import re

import pyarrow.parquet as pq

from ..core.packing import pack_sentences
from ..core.textops import extract_text, render_html
from ..operators.nre import PAIR_ID_BASE
from ..operators.triples import DELIMITERS
from ..sources import pages as ps
from .pipeline import Mention, detect_mentions


def _translit(text: str) -> str:
    mapping = ps.word_mapping()
    return "".join(mapping.get(w, "") for w in (text or "").split(" "))


def docworld_records(sf_dir: str, verify_html_roundtrip: bool = False):
    """documents.parquet → [(url, rec_id, text)] packed zh records."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text", "lang"]
    ).to_pylist()
    records = []
    for row in t:
        if row["lang"] != "zh":
            continue
        url = f"https://{row['source']}.test/p{row['doc_id']}"
        text = _translit(row["text"])
        if verify_html_roundtrip:
            assert extract_text(render_html(text, row["lang"], title=url)) == text
        if not text:
            continue
        for rec_id, (rec_text, _e) in enumerate(pack_sentences(text, [], 382)):
            records.append((url, rec_id, rec_text))
    return records


_DIGIT = re.compile(r"\d")


def _surface_dictionary() -> dict[tuple[str, str], int]:
    """(normalized surface, label_type) → min entity_id, mirroring
    operators/link.py:surface_dictionary."""
    entities, _ = ps.dictionary()
    out: dict[tuple[str, str], int] = {}
    for e in entities:
        for s in [e.canonical_name, *e.aliases]:
            key = (_DIGIT.sub("0", s), e.label_type)
            if key not in out or e.entity_id < out[key]:
                out[key] = e.entity_id
    return out


def docworld_linked(mentions: list[Mention]) -> list[tuple]:
    """Mirror link_mentions: normalize, inner join, keep type-matched."""
    dic = _surface_dictionary()
    out = []
    for m in mentions:
        norm = _DIGIT.sub("0", m.surface)
        eid = dic.get((norm, m.label_type))
        if eid is not None:
            out.append(
                (m.url, m.rec_id, m.start_pos, m.end_pos, m.label_type, norm, eid)
            )
    return out


def docworld_component_map() -> dict[int, int]:
    """entity_id → canonical component id, mirroring
    operators/canonicalize.py:entity_component_map over the doc-world
    alias-chain equivalences (min entity_id reachable through shared
    surfaces + equivalence edges)."""
    dic = _surface_dictionary()  # (surface, type) → node entity_id
    # surface → node ids (a surface may carry several types)
    by_surface: dict[str, list[int]] = {}
    for (s, _t), eid in dic.items():
        by_surface.setdefault(s, []).append(eid)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in ps.doc_equivalences():
        na = by_surface.get(_DIGIT.sub("0", a), [])
        nb = by_surface.get(_DIGIT.sub("0", b), [])
        for x in na:
            for y in nb:
                union(x, y)
    # component id = min node id in component
    comp = {n: find(n) for n in parent}
    # surface_components: surface → min over its nodes' components
    surface_comp = {
        s: min(comp.get(n, n) for n in nodes) for s, nodes in by_surface.items()
    }
    # entity_component_map: entity → min over its surfaces' components
    entities, _ = ps.dictionary()
    out: dict[int, int] = {}
    for e in entities:
        for s in [e.canonical_name, *e.aliases]:
            norm = _DIGIT.sub("0", s)
            # only surfaces that survived the (surface, type) dedup as
            # this entity's rows matter for the Spark join; but the
            # Spark-side join is on surface alone, so any row with this
            # surface contributes
            if norm in surface_comp:
                c = surface_comp[norm]
                if e.entity_id not in out or c < out[e.entity_id]:
                    out[e.entity_id] = c
    return out


def docworld_triples(
    linked: list[tuple], records: list[tuple[str, int, str]]
) -> list[tuple]:
    """Mirror emit_triples_narrow over linked mentions."""
    rules = {(r.subj_label, r.obj_label): r for r in ps.doc_rules()}
    cmap = docworld_component_map()
    rec_text = {(u, r): t for u, r, t in records}
    by_rec: dict[tuple[str, int], list[tuple]] = {}
    for row in linked:
        by_rec.setdefault((row[0], row[1]), []).append(row)

    triples = set()
    for key, ms in by_rec.items():
        text = rec_text[key]
        for m1 in ms:
            for m2 in ms:
                if m1[2] >= m2[2]:  # start_pos ordering (strict)
                    continue
                between = text[m1[3] : m2[2]]
                if any(d in between for d in DELIMITERS):
                    continue
                rule = rules.get((m1[4], m2[4]))
                if rule is None or rule.pattern not in between:
                    continue
                e1, e2 = m1[6], m2[6]
                subj = cmap.get(e1, e1)
                obj = cmap.get(e2, e2)
                triples.add((subj, rule.predicate, obj, key[0], key[1]))
    return sorted(triples)


def docworld_mrc_answers(sf_dir: str):
    """q_mrc_answers' numpy twin: best MRC answer per (zh page, type)."""
    from ..core.artifacts import get_mrc_weights
    from .mrc import best_answers

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text", "lang"]
    ).to_pylist()
    pages = []
    for row in t:
        if row["lang"] != "zh":
            continue
        text = _translit(row["text"])
        if not text:
            continue
        pages.append((f"https://{row['source']}.test/p{row['doc_id']}", text))
    return [
        (url, typ, ans, round(prob, 6), round(sd, 6))
        for url, typ, ans, prob, sd in best_answers(pages, get_mrc_weights())
    ]


def docworld_relations_scored(
    records: list[tuple[str, int, str]], mentions: list[Mention]
):
    """q_kg_relations_scored's numpy twin: all ordered delimiter-free
    mention pairs per record → record-shared features → hierarchical
    relation head (same per-record grouping as the Spark operator, so
    results are bit-comparable)."""
    from ..core.artifacts import get_nre_weights, nre_relation_labels
    from ..core.nre import classify_pairs, record_pair_features
    from ..core.vocab import build_vocab

    weights = get_nre_weights()
    labels = nre_relation_labels()
    vocab = build_vocab()
    rec_text = {(u, r): t for u, r, t in records}
    by_rec: dict[tuple[str, int], list[Mention]] = {}
    for m in mentions:
        by_rec.setdefault((m.url, m.rec_id), []).append(m)

    out = []
    for (url, rec_id), ms in by_rec.items():
        text = rec_text[(url, rec_id)]
        prs, pids = [], []
        for m1 in ms:
            for m2 in ms:
                if m1.start_pos >= m2.start_pos:
                    continue
                between = text[m1.end_pos : m2.start_pos]
                if any(d in between for d in DELIMITERS):
                    continue
                prs.append((m1.start_pos, m1.end_pos, m2.start_pos, m2.end_pos))
                pids.append(m1.start_pos * PAIR_ID_BASE + m2.start_pos)
        if not prs:
            continue
        feats = record_pair_features(text, prs, weights, vocab)
        pred, prob = classify_pairs(feats, weights)
        for pid, pi, pr in zip(pids, pred, prob):
            out.append((url, rec_id, pid, labels[pi], round(float(pr), 6)))
    return sorted(out)


def compute_golden(sf_dir: str):
    """→ dict of pandas DataFrames with the Spark queries' exact schemas."""
    import pandas as pd

    records = docworld_records(sf_dir)
    mentions = detect_mentions(records)
    linked = docworld_linked(mentions)
    triples = docworld_triples(linked, records)
    mrc = docworld_mrc_answers(sf_dir)
    relations = docworld_relations_scored(records, mentions)

    m_df = pd.DataFrame(
        [(m.url, m.rec_id, m.start_pos, m.end_pos, m.label_type, m.surface) for m in mentions],
        columns=["url", "rec_id", "start_pos", "end_pos", "label_type", "surface"],
    ).astype({"rec_id": "int32", "start_pos": "int32", "end_pos": "int32"})
    l_df = pd.DataFrame(
        linked,
        columns=["url", "rec_id", "start_pos", "end_pos", "label_type", "surface", "entity_id"],
    ).astype({"rec_id": "int32", "start_pos": "int32", "end_pos": "int32", "entity_id": "int64"})
    t_df = pd.DataFrame(
        triples, columns=["subj_id", "predicate", "obj_id", "url", "rec_id"]
    ).astype({"subj_id": "int64", "obj_id": "int64", "rec_id": "int32"})
    mrc_df = pd.DataFrame(
        mrc, columns=["url", "label_type", "answer", "prob", "score_diff"]
    ).astype({"prob": "float64", "score_diff": "float64"})
    rel_df = pd.DataFrame(
        relations, columns=["url", "rec_id", "pair_id", "predicate", "score"]
    ).astype({"rec_id": "int32", "pair_id": "int64", "score": "float64"})
    from .fit import crf_fit_frame

    return {
        "kg_mentions": m_df,
        "kg_linked": l_df,
        "kg_triples": t_df,
        "mrc_answers": mrc_df,
        "kg_relations_scored": rel_df,
        "crf_fit": crf_fit_frame(sf_dir),
    }


def write_golden(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, df in compute_golden(sf_dir).items():
        df.to_parquet(f"{out_dir}/{name}.parquet", index=False)


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "golden",
        os.path.basename(sf.rstrip("/")),
    )
    write_golden(sf, out)
    print(f"golden written to {out}")
