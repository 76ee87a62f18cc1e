"""Surrogate model: Viterbi correctness + determinism + quality bar."""

import numpy as np

from knowledgeextraction_spark.core.labels import LABEL_MAP, LABELS
from knowledgeextraction_spark.core.model import (
    make_bio_transitions,
    viterbi_decode,
)


def _brute_force_viterbi(logits, trans):
    """Exponential enumeration oracle for tiny T/C."""
    t, c = logits.shape
    best_score, best_path = -np.inf, None
    import itertools

    for path in itertools.product(range(c), repeat=t):
        s = logits[0][path[0]]
        for i in range(1, t):
            s += trans[path[i - 1], path[i]] + logits[i][path[i]]
        if s > best_score:
            best_score, best_path = s, list(path)
    return best_path


def test_viterbi_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(20):
        t, c = int(rng.integers(1, 6)), int(rng.integers(2, 5))
        logits = rng.standard_normal((1, t, c))
        trans = rng.standard_normal((c, c))
        got = viterbi_decode(logits, np.array([t]), trans)[0, :t].tolist()
        want = _brute_force_viterbi(logits[0], trans)
        assert got == want, (trial, got, want)


def test_viterbi_batched_equals_single():
    rng = np.random.default_rng(1)
    c = 5
    lengths = np.array([3, 7, 1, 5])
    t = int(lengths.max())
    logits = rng.standard_normal((4, t, c))
    trans = rng.standard_normal((c, c))
    batched = viterbi_decode(logits, lengths, trans)
    for i, ln in enumerate(lengths):
        single = viterbi_decode(logits[i : i + 1, :ln], np.array([ln]), trans)
        assert batched[i, :ln].tolist() == single[0].tolist()


def test_bio_transitions_forbid_invalid():
    trans = make_bio_transitions(LABELS)
    b = LABEL_MAP["disease-B"]
    i = LABEL_MAP["disease-I"]
    o = LABEL_MAP["O"]
    other_i = LABEL_MAP["medicine-I"]
    assert trans[b, i] == 0.0
    assert trans[i, i] == 0.0
    assert trans[o, i] == -1e4  # I cannot follow O
    assert trans[b, other_i] == -1e4  # I cannot follow other-type B
    assert trans[o, b] == 0.0


def test_viterbi_respects_transitions():
    """With O and disease-I tied in emissions, transitions must pick
    a valid BIO path (never I after O)."""
    trans = make_bio_transitions(LABELS)
    c = len(LABELS)
    logits = np.zeros((1, 4, c))
    i_id = LABEL_MAP["disease-I"]
    logits[0, :, i_id] = 5.0  # emission prefers I everywhere
    # O wins decisively at position 0 (no start potentials — TF CRF
    # semantics — so the margin must beat the whole I-run's gain)
    logits[0, 0, LABEL_MAP["O"]] = 30.0
    path = viterbi_decode(logits, np.array([4]), trans)[0]
    tags = [LABELS[t] for t in path]
    assert tags[0] == "O"
    # after O, I is forbidden: the decoder must insert a B first
    assert tags[1] == "disease-B"
    assert tags[2] == tags[3] == "disease-I"


def test_weights_deterministic_across_calls():
    from knowledgeextraction_spark.core.artifacts import get_weights

    w1 = get_weights()
    w2 = get_weights()
    for k in w1:
        assert np.array_equal(w1[k], w2[k])


def test_detection_quality_bar():
    """Held-out mention P/R vs planted gold ≥ 0.7 (quality floor; the
    oracle-parity gate is separate and exact)."""
    from knowledgeextraction_spark.core.packing import pack_sentences
    from knowledgeextraction_spark.fixtures.generator import generate_corpus
    from knowledgeextraction_spark.oracle.pipeline import detect_mentions

    corpus = generate_corpus(n_pages=60, seed=42)
    gold, recs = set(), []
    for p in corpus.pages:
        if p.lang != "zh":
            continue
        for rid, (txt, ents) in enumerate(pack_sentences(p.text, p.entities)):
            recs.append((p.url, rid, txt))
            gold.update((p.url, rid, s, e, lab) for lab, s, e in ents)
    pred = {
        (m.url, m.rec_id, m.start_pos, m.end_pos, m.label_type)
        for m in detect_mentions(recs)
    }
    tp = len(gold & pred)
    assert tp / len(pred) >= 0.7, f"precision {tp/len(pred):.3f}"
    assert tp / len(gold) >= 0.7, f"recall {tp/len(gold):.3f}"
