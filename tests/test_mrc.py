"""M4/M5 MRC span model: featurization semantics + answer quality +
Spark/numpy parity (the docworld golden tests cover the sf-dir path;
these cover the fixture-corpus path and the featurizer contract)."""

import numpy as np
import pytest

from knowledgeextraction_spark.core.mrc import (
    DOC_STRIDE,
    MAX_ANSWER_LENGTH,
    MAX_QUERY_LENGTH,
    MAX_SEQ_LENGTH,
    QUESTIONS,
    assemble_nbest,
    batch_candidates,
    candidates_for_example,
    featurize_example,
    is_max_context,
)
from knowledgeextraction_spark.core.vocab import CLS_ID, SEP_ID


def test_query_truncated_to_max_query_length():
    """P5: queries are cut to 64 chars (mrc_utils.py:125-127)."""
    feats = featurize_example("问" * 200, "内容内容")
    f = feats[0]
    # [CLS] + 64 query + [SEP] = doc_offset 66
    assert f.doc_offset == 1 + MAX_QUERY_LENGTH + 1
    assert f.input_ids[0] == CLS_ID
    assert f.input_ids[f.doc_offset - 1] == SEP_ID


def test_doc_spans_cover_context_with_stride():
    """W1: sliding spans, stride 128, full coverage, overlap."""
    ctx = "字" * 1000
    feats = featurize_example("找出", ctx)
    starts = [f.span_start for f in feats]
    assert starts[0] == 0
    assert all(b - a == DOC_STRIDE for a, b in zip(starts, starts[1:]))
    last = feats[-1]
    assert last.span_start + last.span_length == len(ctx)
    for f in feats:
        assert len(f.input_ids) == MAX_SEQ_LENGTH
        assert f.input_ids[f.doc_offset + f.span_length] == SEP_ID


def test_is_max_context_semantics():
    """W2: _check_is_max_context (mrc_utils.py:80-113) hand case."""
    spans = [(0, 5), (3, 5)]  # 'bought' example shape
    # position 4: span0 left=4/right=0 → min 0; span1 left=1/right=3 → min 1
    assert not is_max_context(spans, 0, 4)
    assert is_max_context(spans, 1, 4)


def test_answer_length_cap():
    """W9: no candidate longer than max_answer_length=30."""
    from knowledgeextraction_spark.core.artifacts import get_mrc_weights

    w = get_mrc_weights()
    rows, _ = candidates_for_example("disease", "病" * 500, w)
    assert all(e - s + 1 <= MAX_ANSWER_LENGTH for _si, s, e, *_ in rows)


def test_nonce_prediction_on_empty_candidates():
    nbest = assemble_nbest([], "任意内容")
    assert nbest[0]["text"] == "" and nbest[0]["probability"] == 1.0


def test_nbest_dedup_keeps_first_and_softmax_sums_to_one():
    rows = [
        (0, 0, 1, -0.1, -0.1),
        (0, 0, 1, -0.1, -0.1),   # same position → averaged, not duplicated
        (0, 2, 3, -0.5, -0.5),
        (1, 0, 1, -2.0, -2.0),   # other span, same text → deduped
    ]
    nbest = assemble_nbest(rows, "甲甲乙乙")
    texts = [x["text"] for x in nbest]
    assert texts.count("甲甲") == 1
    assert abs(sum(x["probability"] for x in nbest) - 1.0) < 1e-9


def test_top1_answer_quality_on_fixture_corpus():
    """The surrogate is a real model: top-1 exact-match well above
    chance on held-out fixture pages (seed disjoint from training)."""
    from knowledgeextraction_spark.core.artifacts import get_mrc_weights
    from knowledgeextraction_spark.fixtures.generator import generate_corpus

    w = get_mrc_weights()
    corpus = generate_corpus(n_pages=20, seed=99)
    pages = [p for p in corpus.pages if p.lang == "zh"][:12]
    ex = []
    keys = []
    for page in pages:
        present = {l for l, _, _ in page.entities}
        for typ in QUESTIONS:
            if typ in present:
                ex.append((typ, page.text))
                keys.append((page, typ))
    results = batch_candidates(ex, w)
    hit = 0
    for (page, typ), (rows, _) in zip(keys, results):
        golds = {page.text[s:e] for l, s, e in page.entities if l == typ}
        top = assemble_nbest(rows, page.text)[0]["text"]
        hit += top in golds
    assert hit / len(keys) > 0.4, f"{hit}/{len(keys)}"


def test_span_head_scores_shared_encode_exact():
    """r06: the shared-passage encoding (group-by-span, prefix+copy)
    must equal encoding every row alone (b=1 batches are trivially
    unshared) EXACTLY — this also pins the per-row GEMM-stability
    assumption the sharing relies on."""
    import numpy as np

    from knowledgeextraction_spark.core import mrc as M
    from knowledgeextraction_spark.core.artifacts import get_mrc_weights
    from knowledgeextraction_spark.core.vocab import build_vocab

    weights = get_mrc_weights()
    vocab = build_vocab()
    ctxs = [
        "丞业连乙甲示低些" * 40,   # multi-type shared span
        "丞业。",                # tiny span (sub-WINDOW tail)
        "甲示低些" * 20,          # second shared span
    ]
    feats = []
    for ctx in ctxs:
        for typ in M.ENTITY_TYPES:
            for f in M.featurize_example(M.QUESTIONS[typ], ctx, vocab=vocab):
                feats.append((M.TYPE_INDEX[typ], f))
    ids = np.asarray([f.input_ids for _, f in feats], dtype=np.int64)
    tids = np.asarray([ti for ti, _ in feats], dtype=np.int64)
    offs = np.asarray([f.doc_offset for _, f in feats], dtype=np.int64)
    lens = np.asarray([f.input_len for _, f in feats], dtype=np.int64)

    batched = M.span_head_scores(ids, tids, offs, lens, weights)
    for i in range(len(feats)):
        single = M.span_head_scores(
            ids[i : i + 1], tids[i : i + 1], offs[i : i + 1], lens[i : i + 1], weights
        )
        for a, b in zip(batched, single):
            assert np.array_equal(a[i : i + 1], b), f"row {i} diverged"


def test_spark_matches_numpy_on_fixture_pages(spark, corpus):
    """End-to-end parity: Spark mapInPandas + relational n-best ==
    numpy oracle on the fixture corpus."""
    from knowledgeextraction_spark.broadcast import mrc_weights_broadcast
    from knowledgeextraction_spark.core.artifacts import get_mrc_weights
    from knowledgeextraction_spark.operators.mrc import mrc_answers
    from knowledgeextraction_spark.oracle.mrc import best_answers

    pages = [(p.url, p.text) for p in corpus.pages if p.lang == "zh" and p.text][:15]
    df = spark.createDataFrame(pages, "url string, text string")
    got = {
        (r.url, r.label_type): (r.answer, round(r.prob, 9), round(r.score_diff, 9))
        for r in mrc_answers(df, mrc_weights_broadcast(spark)).collect()
    }
    want = {
        (url, typ): (ans, round(prob, 9), round(sd, 9))
        for url, typ, ans, prob, sd in best_answers(pages, get_mrc_weights())
    }
    assert got == want and len(got) == len(pages) * len(QUESTIONS)


def test_py_strip_matches_python_str_strip(spark):
    """operators/mrc.py trims answer text with py_strip (Catalyst); the
    numpy twin uses str.strip().  Python strips ALL Unicode whitespace
    (tab, LS/PS, NBSP, full-width space...), F.trim strips ASCII space
    only — assert the Catalyst expression reproduces Python exactly on
    edge-bearing strings."""
    from pyspark.sql import functions as F

    from knowledgeextraction_spark.operators.mrc import py_strip

    nasty = [
        " plain ",
        "\tleading tab",
        "trailing newline\n",
        "　full-width　",
        " nbsp ",
        " line-sep ",
        " mix \t ",
        "inner 　 stays",
        "",
        "　\t \n",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "s string")
    got = [r["t"] for r in df.select(py_strip(F.col("s")).alias("t")).collect()]
    assert got == [s.strip() for s in nasty]
