"""Single-node numpy oracle for the MRC answer pipeline (M4/M5).

Mirrors operators/mrc.py end-to-end: featurize → span heads →
accumulate → n-best → best-non-null, per (page, entity type) example.
Shares core/mrc.py's model math with the Spark path (the parity tests
assert the SPARK plumbing — example fan-out, candidate shuttling,
relational n-best assembly — reproduces this reference assembly
exactly, the same split the CRF oracle uses)."""

from __future__ import annotations

import numpy as np

from ..core.labels import ENTITY_TYPES
from ..core.mrc import assemble_nbest, batch_candidates
from ..core.vocab import build_vocab


def best_answers(
    pages: list[tuple[str, str]], weights: dict[str, np.ndarray]
) -> list[tuple[str, str, str, float, float]]:
    """[(url, context)] → [(url, label_type, answer, prob, score_diff)]
    for every (page, entity type) example."""
    vocab = build_vocab()
    examples = [
        (url, typ, ctx) for url, ctx in pages for typ in ENTITY_TYPES
    ]
    results = batch_candidates([(t, c) for _, t, c in examples], weights, vocab)
    out = []
    for (url, typ, ctx), (rows, feat_cls) in zip(examples, results):
        nbest = assemble_nbest(rows, ctx)
        best = nbest[0]
        score_diff = float(np.mean([c for _, c in feat_cls]))
        out.append((url, typ, best["text"], float(best["probability"]), score_diff))
    return out
