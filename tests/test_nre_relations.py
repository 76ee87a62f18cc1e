"""M7 model-based relation classification: head quality vs the rule
ground truth, determinism, and the Spark/numpy parity of the scored
query (golden tests cover the sf-dir path)."""

import numpy as np

from knowledgeextraction_spark.core.artifacts import (
    get_nre_weights,
    nre_relation_labels,
)
from knowledgeextraction_spark.core.nre import (
    classify_pairs,
    record_pair_features,
)
from knowledgeextraction_spark.core.vocab import build_vocab
from knowledgeextraction_spark.operators.triples import DELIMITERS
from knowledgeextraction_spark.sources.pages import (
    DOC_WORDS,
    dictionary,
    doc_rules,
    word_mapping,
)


def _held_out_sentences(n_sentences=400, seed=12345):
    """→ [(text, [(hs, he, ts, te)], [gold predicate])] on fresh
    doc-world-style text."""
    mapping = word_mapping()
    ents, _ = dictionary()
    tos = {e.canonical_name: e.label_type for e in ents}
    rules = {(r.subj_label, r.obj_label): r for r in doc_rules()}
    rng = np.random.default_rng(seed)
    out = []
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
        prs, ys = [], []
        for i, (l1, s1, e1) in enumerate(spans):
            for l2, s2, e2 in spans[i + 1 :]:
                if s2 <= s1:
                    continue
                bet = text[e1:s2]
                if any(d in bet for d in DELIMITERS):
                    continue
                r = rules.get((l1, l2))
                ys.append(r.predicate if r and r.pattern in bet else "NA")
                prs.append((s1, e1, s2, e2))
        if prs:
            out.append((text, prs, ys))
    return out


def test_relation_head_accuracy_vs_rule_truth():
    """North-rule spirit: the model path matches the rule emitter at
    P/R >= 0.95 overall on held-out doc-world text."""
    w = get_nre_weights()
    labels = nre_relation_labels()
    vocab = build_vocab()
    got, want = [], []
    for text, prs, ys in _held_out_sentences():
        feats = record_pair_features(text, prs, w, vocab)
        pred, _ = classify_pairs(feats, w)
        got += [labels[i] for i in pred]
        want += ys
    acc = np.mean([a == b for a, b in zip(got, want)])
    pos = [i for i, v in enumerate(want) if v != "NA"]
    pos_acc = np.mean([got[i] == want[i] for i in pos])
    assert acc >= 0.95, acc
    assert pos_acc >= 0.85, pos_acc


def test_record_pair_features_solo_vs_grouped():
    """One pair alone vs grouped with its record's other pairs: BLAS
    kernel noise only (~1e-15, far below the 1e-6 reporting);
    classifications identical."""
    w = get_nre_weights()
    vocab = build_vocab()
    text, prs, _ = _held_out_sentences(n_sentences=40)[0]
    solo = record_pair_features(text, prs[:1], w, vocab)
    grouped = record_pair_features(text, prs, w, vocab)
    np.testing.assert_allclose(solo[0], grouped[0], rtol=0, atol=1e-9)
    p1, s1 = classify_pairs(solo, w)
    p2, s2 = classify_pairs(grouped[:1], w)
    assert p1[0] == p2[0] and round(s1[0], 6) == round(s2[0], 6)


def test_record_pair_marker_windows_match_encode_pair():
    """r06: the slice-copy marked-sequence construction inside
    record_pair_features must reproduce encode_pair's ids, positions,
    truncation and window padding exactly — checked through the final
    feature matrix against a reference built the old way."""
    import random

    from knowledgeextraction_spark.core.model import WINDOW, folded64
    from knowledgeextraction_spark.core.nre import encode_pair

    weights = get_nre_weights()
    vocab = build_vocab()
    f = folded64(weights)
    k_slots = 2 * WINDOW + 1
    rng = random.Random(11)
    # include a long record (truncation at max_length=128 bites) and a
    # short one, reversed pairs, adjacent entities, edge positions
    for L in (380, 40, 9):
        text = ("丞业连乙甲示低些" * 48)[:L]
        pairs = []
        for _ in range(60):
            a = rng.randrange(0, max(L - 4, 1))
            b = min(a + rng.randrange(1, 3), L)
            c = rng.randrange(0, max(L - 2, 1))
            d = min(c + rng.randrange(1, 3), L)
            if b <= c or d <= a:  # non-overlapping either order
                if a != c:
                    pairs.append((a, b, c, d))
        pairs.append((0, 1, L - 1, L))  # extreme edges
        got = record_pair_features(text, pairs, weights, vocab)

        # reference marker features via encode_pair (the pre-r06 path)
        win_ids = np.full((2 * len(pairs), k_slots), f.v, dtype=np.int64)
        for i, (hs, he, ts, te) in enumerate(pairs):
            ids, mask, ph, pt = encode_pair(text, (hs, he), (ts, te), 128, vocab)
            avai = sum(mask)
            padded = [f.v] * WINDOW + list(ids[:avai]) + [f.v] * WINDOW
            win_ids[2 * i] = padded[ph : ph + k_slots]
            win_ids[2 * i + 1] = padded[pt : pt + k_slots]
        h1_m = np.zeros((2 * len(pairs), 256), dtype=np.float64)
        for k in range(k_slots):
            h1_m += f.g64[k][win_ids[:, k]]
        h1_m += f.b1
        np.tanh(h1_m, out=h1_m)
        h2_m = np.tanh(h1_m @ f.w2 + f.b2)
        ctx_m = np.concatenate(
            [f.emb64[win_ids[:, k]] for k in range(k_slots)], axis=1
        )
        marker = np.concatenate([h2_m, ctx_m], axis=1)
        assert np.array_equal(got[:, : marker.shape[1]], marker[0::2]), L
        assert np.array_equal(
            got[:, marker.shape[1] : 2 * marker.shape[1]], marker[1::2]
        ), L


def test_classify_relations_spark_matches_numpy(spark):
    from knowledgeextraction_spark.broadcast import nre_weights_broadcast
    from knowledgeextraction_spark.operators.nre import classify_relations

    w = get_nre_weights()
    labels = nre_relation_labels()
    vocab = build_vocab()
    sents = _held_out_sentences(n_sentences=30)
    rows = []
    for k, (text, prs, _ys) in enumerate(sents):
        for (s1, e1, s2, e2) in prs:
            rows.append((f"u{k}", 0, s1 * 1000 + s2, text, s1, e1, s2, e2))
    df = spark.createDataFrame(
        rows,
        "url string, rec_id int, pair_id long, text string, "
        "h_start int, h_end int, t_start int, t_end int",
    )
    got = {
        (r.url, r.pair_id): (r.predicate, round(r.score, 6))
        for r in classify_relations(df, nre_weights_broadcast(spark)).collect()
    }
    want = {}
    for k, (text, prs, _ys) in enumerate(sents):
        feats = record_pair_features(text, prs, w, vocab)
        pred, prob = classify_pairs(feats, w)
        for (s1, e1, s2, e2), pi, pr in zip(prs, pred, prob):
            want[(f"u{k}", s1 * 1000 + s2)] = (labels[pi], round(float(pr), 6))
    assert got == want and len(got) == len(rows)


def test_classify_relations_fused_matches_exploded(spark, corpus):
    """r06: classify_relations_fused over the fused detect output must
    equal classify_relations ∘ mention_pairs row for row."""
    from knowledgeextraction_spark.broadcast import (
        nre_weights_broadcast,
        weights_broadcast,
    )
    from knowledgeextraction_spark.operators.detect import (
        detect_records_from_pages,
    )
    from knowledgeextraction_spark.operators.nre import (
        classify_relations,
        classify_relations_fused,
        mention_pairs,
    )
    from knowledgeextraction_spark.sources.pages import fixture_pages

    pages = fixture_pages(spark, corpus).select("url", "html")
    rm = detect_records_from_pages(pages, weights_broadcast(spark)).cache()
    a = {
        tuple(r)
        for r in classify_relations(
            mention_pairs(rm), nre_weights_broadcast(spark)
        ).collect()
    }
    b = {
        tuple(r)
        for r in classify_relations_fused(
            rm, nre_weights_broadcast(spark)
        ).collect()
    }
    assert a == b and len(a) > 0


def test_classify_pairs_extreme_margin_no_overflow():
    """A strongly negative detector margin must not overflow np.exp
    (executor-log RuntimeWarning noise at scale); the clipped sigmoid
    is bit-identical in the normal |5-s|<60 range and still saturates
    to NA/prob 1.0 beyond it."""
    import warnings

    import numpy as np

    from knowledgeextraction_spark.core.artifacts import get_nre_weights, nre_relation_labels
    from knowledgeextraction_spark.core.nre import MARKER_DIM, POOL_DIM, classify_pairs

    w = dict(get_nre_weights())
    # zero feature row + a huge negative bias in the connective head
    # drives the detector margin to -1e6 for every connective
    feats = np.zeros((1, MARKER_DIM + POOL_DIM), dtype=np.float64)
    w["nre_conn_w"] = np.zeros_like(w["nre_conn_w"])
    w["nre_conn_w"][-1, :] = -1e6  # bias row
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pred, prob = classify_pairs(feats, w)
    labels = nre_relation_labels()
    assert labels[pred[0]] == "NA" and prob[0] == 1.0


def test_bag_relations_pooling_arithmetic(spark):
    """bag_relations pools per-sentence scores per linked (head, tail)
    pair: softmax-attention mean + max + count, hand-computed here on a
    two-sentence bag plus a singleton; a pair with an unlinked mention
    contributes nothing (inner join on entity resolution)."""
    import math

    from knowledgeextraction_spark.operators.nre import PAIR_ID_BASE, bag_relations

    scored = spark.createDataFrame(
        [
            # bag (e1, e2): two sentences, scores 0.9 / 0.5
            ("u1", 0, 3 * PAIR_ID_BASE + 9, "rel_a", 0.9),
            ("u2", 0, 5 * PAIR_ID_BASE + 11, "rel_a", 0.5),
            # singleton bag (e1, e3)
            ("u1", 0, 3 * PAIR_ID_BASE + 20, "rel_b", 0.7),
            # tail mention at pos 30 is unlinked → dropped
            ("u1", 0, 3 * PAIR_ID_BASE + 30, "rel_a", 0.4),
        ],
        "url string, rec_id int, pair_id long, predicate string, score double",
    )
    linked = spark.createDataFrame(
        [
            ("u1", 0, 3, 100), ("u1", 0, 9, 200), ("u1", 0, 20, 300),
            ("u2", 0, 5, 100), ("u2", 0, 11, 200),
        ],
        "url string, rec_id int, start_pos int, entity_id long",
    )
    rows = {
        (r.subj_id, r.obj_id, r.predicate): r
        for r in bag_relations(scored, linked).collect()
    }
    assert set(rows) == {(100, 200, "rel_a"), (100, 300, "rel_b")}

    big = rows[(100, 200, "rel_a")]
    w = [math.exp(0.9), math.exp(0.5)]
    want = (w[0] * 0.9 + w[1] * 0.5) / sum(w)
    assert big.n_sentences == 2
    assert abs(big.bag_score - want) < 1e-12
    assert abs(big.max_score - 0.9) < 1e-12

    solo = rows[(100, 300, "rel_b")]
    assert solo.n_sentences == 1 and abs(solo.bag_score - 0.7) < 1e-12
