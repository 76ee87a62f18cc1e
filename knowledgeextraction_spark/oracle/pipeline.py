"""Single-node oracle pipeline: pages → mentions → links → triples.

Runs the exact same per-row functions (core/*) and the same surrogate
weights as the Spark pipeline, in plain Python/numpy — its outputs are
the goldens for BASELINE.json's "triple P/R ≥ 0.95 vs reference"
(SURVEY.md §5 item 2: expect 1.0, same decode, same weights).

Mirrors the reference serving flow (ner_server.py:11-27 →
crf_albert.py:209-226): text → packed records → featurize → encode →
decode → recover tags → mentions, then the [NORTH] extensions: dict
linking, canonicalization (components), rule-based triple emission.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.artifacts import get_weights
from ..core.bio import tags_to_mentions
from ..core.featurize import convert_single_example, recover_tags
from ..core.labels import INV_LABEL_MAP
from ..core.model import encode_logits_trimmed, viterbi_decode
from ..core.packing import pack_sentences
from ..core.textops import extract_text
from ..core.vocab import build_vocab
from ..fixtures.generator import Corpus
from ..operators.triples import DELIMITERS

BATCH = 128


@dataclass(frozen=True)
class Mention:
    url: str
    rec_id: int
    start_pos: int
    end_pos: int
    label_type: str
    surface: str


@dataclass(frozen=True)
class Triple:
    subj_id: int
    predicate: str
    obj_id: int
    url: str
    rec_id: int


def detect_mentions(records: list[tuple[str, int, str]], weights=None) -> list[Mention]:
    """records: (url, rec_id, text) → mentions via encoder+Viterbi."""
    if weights is None:
        weights = get_weights()
    vocab = build_vocab()
    mentions: list[Mention] = []
    for i in range(0, len(records), BATCH):
        chunk = records[i : i + BATCH]
        feats = [convert_single_example(t, vocab=vocab) for _, _, t in chunk]
        input_ids = np.asarray([f[0] for f in feats], dtype=np.int64)
        lengths = np.asarray([sum(f[1]) for f in feats], dtype=np.int64)
        tmax = int(lengths.max()) if len(lengths) else 0
        logits = encode_logits_trimmed(input_ids, tmax, weights)
        paths = viterbi_decode(logits, lengths, weights["trans"])
        for (url, rec_id, text), path, ids in zip(chunk, paths, input_ids):
            tags = recover_tags(path.tolist(), ids.tolist(), INV_LABEL_MAP)
            for label, s, e in tags_to_mentions(tags):
                mentions.append(Mention(url, rec_id, s, e, label, text[s:e]))
    return mentions


def link_mentions(
    mentions: list[Mention], entities
) -> list[tuple[Mention, int]]:
    """Dictionary linking: mention surface → entity_id (drop unlinked).

    Mirrors operators/link.py exactly: surfaces digit-normalized
    (core.textops.normalize_digits) on BOTH sides, dictionary keyed by
    (normalized surface, label_type) with min(entity_id) on collision
    — per TYPE, like Spark's groupBy(surface, label_type) — and the
    mention links only when its label_type agrees.  ``entities`` is the
    canonical entity list (fixtures Entity objects)."""
    from ..core.textops import normalize_digits

    norm_dict: dict[tuple[str, str], int] = {}
    for e in entities:
        for s in [e.canonical_name, *e.aliases]:
            key = (normalize_digits(s), e.label_type)
            if key not in norm_dict or e.entity_id < norm_dict[key]:
                norm_dict[key] = e.entity_id
    out = []
    for m in mentions:
        eid = norm_dict.get((normalize_digits(m.surface), m.label_type))
        if eid is not None:
            out.append((m, eid))
    return out


def emit_triples(
    linked: list[tuple[Mention, int]],
    records: dict[tuple[str, int], str],
    rules: list,
    component_of_entity: dict[int, int],
) -> list[Triple]:
    """Rule-based triple emission (M8/M9 analog).

    For each pair of linked mentions in the same record with
    ``m1.start < m2.start``, no sentence delimiter between them (same
    sentence), and a rule for (m1.type, m2.type) whose connective
    pattern occurs in the between-text: emit (subj, pred, obj) with
    canonicalized ids.
    """
    rule_by_pair = {(r.subj_label, r.obj_label): r for r in rules}
    by_rec: dict[tuple[str, int], list[tuple[Mention, int]]] = {}
    for m, eid in linked:
        by_rec.setdefault((m.url, m.rec_id), []).append((m, eid))

    triples: set[Triple] = set()
    for key, ms in by_rec.items():
        text = records[key]
        ms.sort(key=lambda x: (x[0].start_pos, x[0].end_pos))
        for i in range(len(ms)):
            m1, e1 = ms[i]
            for j in range(len(ms)):
                m2, e2 = ms[j]
                if m1.start_pos >= m2.start_pos or i == j:
                    continue
                between = text[m1.end_pos : m2.start_pos]
                if any(d in between for d in DELIMITERS):
                    continue
                rule = rule_by_pair.get((m1.label_type, m2.label_type))
                if rule is None or rule.pattern not in between:
                    continue
                subj = component_of_entity.get(e1, e1)
                obj = component_of_entity.get(e2, e2)
                triples.add(Triple(subj, rule.predicate, obj, m1.url, m1.rec_id))
    return sorted(triples, key=lambda t: (t.url, t.rec_id, t.subj_id, t.predicate, t.obj_id))


def run_pipeline(corpus: Corpus, max_seq_length: int = 382):
    """Full oracle: pages → extract → gate zh → pack → detect → link → triples.

    Returns (records, mentions, triples) where records maps
    (url, rec_id) → packed text.
    """
    records_list: list[tuple[str, int, str]] = []
    for page in corpus.pages:
        text = extract_text(page.html)
        assert isinstance(text, str)
        if page.lang != "zh":
            continue
        for rec_id, (rec_text, _ents) in enumerate(pack_sentences(text, [], max_seq_length)):
            records_list.append((page.url, rec_id, rec_text))

    mentions = detect_mentions(records_list)
    linked = link_mentions(mentions, corpus.entities)

    # canonical component id per entity: via its canonical surface
    comp_of_entity = {
        e.entity_id: corpus.expected_components[e.canonical_name] for e in corpus.entities
    }
    records = {(u, r): t for u, r, t in records_list}
    triples = emit_triples(linked, records, corpus.rules, comp_of_entity)
    return records, mentions, triples
