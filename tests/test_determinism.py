"""Batch-composition invariance of the detect stage.

A record's decoded tags must not depend on which batch/partition it
lands in (Spark retries + speculative execution re-run tasks with
different groupings). Guards the encode_logits_trimmed PAD-context fix.
"""

import numpy as np

from knowledgeextraction_spark.core.artifacts import get_weights
from knowledgeextraction_spark.core.featurize import convert_single_example
from knowledgeextraction_spark.core.model import (
    encode_logits_trimmed,
    viterbi_decode,
)
from knowledgeextraction_spark.core.packing import pack_sentences
from knowledgeextraction_spark.fixtures.generator import generate_corpus


def _decode(batch_feats, weights):
    input_ids = np.asarray([f[0] for f in batch_feats], dtype=np.int64)
    lengths = np.asarray([sum(f[1]) for f in batch_feats], dtype=np.int64)
    tmax = int(lengths.max())
    logits = encode_logits_trimmed(input_ids, tmax, weights)
    paths = viterbi_decode(logits, lengths, weights["trans"])
    return [p[: int(ln)].tolist() for p, ln in zip(paths, lengths)]


def test_decode_invariant_to_batch_composition():
    weights = get_weights()
    corpus = generate_corpus(n_pages=30, seed=42)
    texts = [
        rec_text
        for p in corpus.pages
        if p.lang == "zh"
        for rec_text, _ in pack_sentences(p.text, [])
    ]
    assert len(texts) >= 10
    feats = [convert_single_example(t) for t in texts]

    # one big batch vs many small, shuffled batches
    big = _decode(feats, weights)
    small = {}
    order = list(range(len(feats)))[::-1]
    for i in range(0, len(order), 3):
        idx = order[i : i + 3]
        out = _decode([feats[j] for j in idx], weights)
        for j, tags in zip(idx, out):
            small[j] = tags
    for j in range(len(feats)):
        assert big[j] == small[j], f"record {j} decode depends on batch composition"
