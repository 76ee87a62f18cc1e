"""Distributed ridge fit (F17/W8 analog) vs the single-node trainer.

The distributed fit accumulates per-partition Gram partials and solves
once on the driver; the single-node fit (core/model.py:fit_projection)
builds one design matrix.  Mathematically identical — numerically the
two encode in different BLAS batch shapes (float32 GEMM noise ~1e-7,
documented in core/model.py), so weights agree to ~1e-3 relative and
the DECODED output is what must match.
"""

import numpy as np
import pytest

from knowledgeextraction_spark.core.artifacts import get_weights
from knowledgeextraction_spark.core.bio import bio_tag
from knowledgeextraction_spark.core.featurize import convert_single_example
from knowledgeextraction_spark.core.model import fit_projection, viterbi_decode
from knowledgeextraction_spark.core.packing import pack_sentences
from knowledgeextraction_spark.core.vocab import build_vocab
from knowledgeextraction_spark.fixtures.generator import generate_corpus
from knowledgeextraction_spark.operators.fit import (
    TRAIN_SCHEMA,
    distributed_ridge_fit,
    fit_select_l2,
    label_frequencies,
    masked_accuracy,
)

FIT_SEED = 11  # disjoint from every other corpus seed (7, 42)


def _records_df(spark, pages, n_partitions=8):
    rows = [
        (p.text, [(lab, s, e) for lab, s, e in p.entities])
        for p in pages
        if p.lang == "zh"
    ]
    return spark.createDataFrame(rows, TRAIN_SCHEMA).repartition(n_partitions)


def _featurize_local(pages, vocab):
    ids_rows, label_rows, mask_rows = [], [], []
    for p in pages:
        if p.lang != "zh":
            continue
        for rec_text, rec_ents in pack_sentences(p.text, p.entities):
            tags = bio_tag(len(rec_text), rec_ents)
            input_ids, input_mask, _seg, label_ids = convert_single_example(
                rec_text, tags, vocab=vocab
            )
            ids_rows.append(input_ids)
            label_rows.append(label_ids)
            mask_rows.append(input_mask)
    return (
        np.asarray(ids_rows, dtype=np.int64),
        np.asarray(label_rows, dtype=np.int64),
        np.asarray(mask_rows, dtype=np.int64),
    )


@pytest.fixture(scope="module")
def fit_corpus():
    return generate_corpus(n_pages=80, seed=FIT_SEED)


def test_label_frequencies_match_local_bincount(spark, fit_corpus):
    vocab = build_vocab()
    _ids, labels, mask = _featurize_local(fit_corpus.pages, vocab)
    want = np.bincount(labels[mask.astype(bool)], minlength=17)
    got = label_frequencies(_records_df(spark, fit_corpus.pages))
    assert np.array_equal(got, want)


def test_distributed_fit_matches_single_node(spark, fit_corpus):
    vocab = build_vocab()
    ids, labels, mask = _featurize_local(fit_corpus.pages, vocab)
    local = dict(get_weights())
    fit_projection(local, ids, labels, mask)

    bc = spark.sparkContext.broadcast(get_weights())
    pw, pb = distributed_ridge_fit(_records_df(spark, fit_corpus.pages), bc)
    assert pw.shape == local["proj_w"].shape and pb.shape == local["proj_b"].shape
    # BLAS batch-shape tolerance, not bit-exactness (module docstring)
    assert np.allclose(pw, local["proj_w"], rtol=1e-3, atol=1e-4)
    assert np.allclose(pb, local["proj_b"], rtol=1e-3, atol=1e-4)

    # what actually matters: the two trained models DECODE the same —
    # Viterbi paths on held-out pages agree per char
    held_out = generate_corpus(n_pages=15, seed=FIT_SEED + 1)
    h_ids, _h_labels, h_mask = _featurize_local(held_out.pages, vocab)
    lengths = h_mask.sum(axis=1)
    base = get_weights()
    from knowledgeextraction_spark.core.model import encode_logits_trimmed

    tmax = int(lengths.max())
    total = agree = 0
    w1 = dict(base); w1["proj_w"], w1["proj_b"] = local["proj_w"], local["proj_b"]
    w2 = dict(base); w2["proj_w"], w2["proj_b"] = pw, pb
    p1 = viterbi_decode(encode_logits_trimmed(h_ids, tmax, w1), lengths, base["trans"])
    p2 = viterbi_decode(encode_logits_trimmed(h_ids, tmax, w2), lengths, base["trans"])
    for row1, row2, ln in zip(p1, p2, lengths):
        total += int(ln)
        agree += int((row1[: int(ln)] == row2[: int(ln)]).sum())
    assert total > 0 and agree / total >= 0.999, f"decode agreement {agree}/{total}"


def test_fit_select_l2_elects_best_dev_checkpoint(spark, fit_corpus):
    pages = [p for p in fit_corpus.pages if p.lang == "zh"]
    train = _records_df(spark, pages[: int(len(pages) * 0.75)])
    dev = _records_df(spark, pages[int(len(pages) * 0.75) :], n_partitions=4)
    bc = spark.sparkContext.broadcast(get_weights())
    grid = (1e-3, 1e-2, 1e-1)
    best_l2, best_acc, pw, pb, accs = fit_select_l2(train, dev, bc, l2_grid=grid)
    assert set(accs) == set(grid)
    assert best_acc == max(accs.values()) and accs[best_l2] == best_acc
    assert best_acc >= 0.9, f"trained model should fit the dev split: {accs}"
    # the elected weights really are the ones scoring best_acc
    assert abs(masked_accuracy(dev, bc, pw, pb) - best_acc) < 1e-12


def test_tree_combined_partials_match_driver_sum(spark, fit_corpus):
    """Forcing the executor-side treeReduce path (threshold 1) must
    produce the same solved weights as the driver-ordered sum — the
    combine-order noise is ~1e-15, far below the asserted tolerance."""
    from knowledgeextraction_spark.operators.fit import distributed_ridge_fit

    bc = spark.sparkContext.broadcast(get_weights())
    records = _records_df(spark, fit_corpus.pages)
    pw_driver, pb_driver = distributed_ridge_fit(records, bc)
    pw_tree, pb_tree = distributed_ridge_fit(records, bc, tree_threshold=1)
    assert np.allclose(pw_tree, pw_driver, rtol=1e-6, atol=1e-8)
    assert np.allclose(pb_tree, pb_driver, rtol=1e-6, atol=1e-8)
