"""M7 model-based relation classification: head quality vs the rule
ground truth, determinism, and the Spark/numpy parity of the scored
query (golden tests cover the sf-dir path)."""

import numpy as np
import pytest

from knowledgeextraction_spark.core.artifacts import (
    get_nre_weights,
    nre_relation_labels,
)
from knowledgeextraction_spark.core.nre import (
    classify_pairs,
    encode_pair,
    pair_features,
)
from knowledgeextraction_spark.core.vocab import build_vocab
from knowledgeextraction_spark.operators.triples import DELIMITERS
from knowledgeextraction_spark.sources.pages import (
    DOC_WORDS,
    dictionary,
    doc_rules,
    word_mapping,
)


def _held_out_pairs(n_sentences=400, seed=12345):
    vocab = build_vocab()
    mapping = word_mapping()
    ents, _ = dictionary()
    tos = {e.canonical_name: e.label_type for e in ents}
    rules = {(r.subj_label, r.obj_label): r for r in doc_rules()}
    rng = np.random.default_rng(seed)
    enc, y = [], []
    for _ in range(n_sentences):
        words = rng.choice(DOC_WORDS, size=int(rng.integers(6, 16)))
        pos, spans, parts = 0, [], []
        for wd in words:
            sn = mapping[wd]
            t = tos.get(sn)
            if t:
                spans.append((t, pos, pos + len(sn)))
            parts.append(sn)
            pos += len(sn)
        text = "".join(parts)
        for i, (l1, s1, e1) in enumerate(spans):
            for l2, s2, e2 in spans[i + 1 :]:
                if s2 <= s1:
                    continue
                bet = text[e1:s2]
                if any(d in bet for d in DELIMITERS):
                    continue
                r = rules.get((l1, l2))
                y.append(r.predicate if r and r.pattern in bet else "NA")
                enc.append(encode_pair(text, (s1, e1), (s2, e2), 128, vocab))
    return enc, y


def test_relation_head_accuracy_vs_rule_truth():
    """North-rule spirit: the model path matches the rule emitter at
    P/R >= 0.95 overall on held-out doc-world text."""
    w = get_nre_weights()
    labels = nre_relation_labels()
    enc, y = _held_out_pairs()
    feats = pair_features(
        [c[0] for c in enc], [sum(c[1]) for c in enc],
        [c[2] for c in enc], [c[3] for c in enc], w,
    )
    pred, _ = classify_pairs(feats, w)
    got = [labels[i] for i in pred]
    acc = np.mean([a == b for a, b in zip(got, y)])
    pos = [i for i, v in enumerate(y) if v != "NA"]
    pos_acc = np.mean([got[i] == y[i] for i in pos])
    assert acc >= 0.95, acc
    assert pos_acc >= 0.85, pos_acc


def test_pair_features_batch_invariant():
    w = get_nre_weights()
    enc, _ = _held_out_pairs(n_sentences=10)
    one = pair_features([enc[0][0]], [sum(enc[0][1])], [enc[0][2]], [enc[0][3]], w)
    many = pair_features(
        [c[0] for c in enc], [sum(c[1]) for c in enc],
        [c[2] for c in enc], [c[3] for c in enc], w,
    )
    assert np.array_equal(one[0], many[0])


def test_classify_relations_spark_matches_numpy(spark):
    from knowledgeextraction_spark.broadcast import nre_weights_broadcast
    from knowledgeextraction_spark.operators.nre import classify_relations, encode_pairs

    w = get_nre_weights()
    labels = nre_relation_labels()
    enc, _ = _held_out_pairs(n_sentences=30)
    vocab = build_vocab()
    # rebuild raw pair rows for the operator path
    mapping = word_mapping()
    rows = []
    # reuse _held_out_pairs generation for raw text/positions
    ents, _r = dictionary()
    tos = {e.canonical_name: e.label_type for e in ents}
    rng = np.random.default_rng(12345)
    k = 0
    for _ in range(30):
        words = rng.choice(DOC_WORDS, size=int(rng.integers(6, 16)))
        pos, spans, parts = 0, [], []
        for wd in words:
            sn = mapping[wd]
            t = tos.get(sn)
            if t:
                spans.append((t, pos, pos + len(sn)))
            parts.append(sn)
            pos += len(sn)
        text = "".join(parts)
        for i, (l1, s1, e1) in enumerate(spans):
            for l2, s2, e2 in spans[i + 1 :]:
                if s2 <= s1:
                    continue
                bet = text[e1:s2]
                if any(d in bet for d in DELIMITERS):
                    continue
                rows.append((f"u{k}", 0, s1 * 1000 + s2, text, s1, e1, s2, e2))
                k += 1
    df = spark.createDataFrame(
        rows,
        "url string, rec_id int, pair_id long, text string, "
        "h_start int, h_end int, t_start int, t_end int",
    )
    got = {
        (r.url, r.pair_id): (r.predicate, round(r.score, 9))
        for r in classify_relations(
            encode_pairs(df), nre_weights_broadcast(spark)
        ).collect()
    }
    # numpy twin
    want = {}
    for (url, rec, pid, text, s1, e1, s2, e2) in rows:
        ids, mask, ph, pt = encode_pair(text, (s1, e1), (s2, e2), 128, vocab)
        feats = pair_features([ids], [sum(mask)], [ph], [pt], get_nre_weights())
        pred, prob = classify_pairs(feats, w)
        want[(url, pid)] = (labels[pred[0]], round(float(prob[0]), 9))
    assert got == want and len(got) == len(rows)
