"""Spark-independent numpy oracle for the ``crf_fit_distributed`` query.

Replays the query's exact semantics in one single-threaded pass — no
Spark, no partitioning: packed zh records (docworld.docworld_records),
weak dictionary labeling with the SAME longest-match-first alternation
(operators/fit.py:weak_label_surfaces), the same md5-bucket 80/20
train/dev split, the same float64 Gram accumulation / ridge solve /
argmax-logit dev scoring kernels (accumulate_gram / solve_ridge /
count_correct — shared pure-numpy functions, called here on the whole
corpus instead of per partition).

Because the fit path is float64 end to end, the only difference from
the distributed run is summation ORDER (per-partition partials vs one
pass), ~1e-15 — far below the round-to-6 golden precision and below
any argmax margin, so accuracy COUNTS agree exactly.  The result is
materialized as ``golden/sf*/crf_fit.parquet`` (the kg_mentions
pattern) and read back by the DuckDB oracle, which closes the one
driver row that was rows-only in round 3.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from ..core.artifacts import get_weights
from ..core.labels import LABELS, NUM_LABELS
from ..core.vocab import build_vocab
from ..operators.fit import (
    _featurized,
    accumulate_gram,
    class_weights_sq,
    count_correct,
    solve_ridge,
    weak_label_surfaces,
)
from .docworld import docworld_records


def _bucket(text: str) -> int:
    """Mirror of the query's split key: pmod(conv(substring(md5(text),
    1, 2), 16, 10) :: int, 5) — Spark md5 hashes the UTF-8 bytes and
    returns lowercase hex, same as hashlib."""
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:2], 16) % 5


def crf_fit_rows(
    sf_dir: str, l2_grid: tuple[float, ...] = (1e-3, 1e-2, 1e-1)
) -> list[tuple[str, float]]:
    """→ [(metric, value)] matching q_crf_fit_distributed's output."""
    pattern, label_of = weak_label_surfaces()
    rx = re.compile(pattern)
    rows = [
        (
            text,
            [
                {"label": label_of[m.group(0)], "start": m.start(), "end": m.end()}
                for m in rx.finditer(text)
            ],
        )
        for _url, _rec_id, text in docworld_records(sf_dir)
    ]
    train = [r for r in rows if _bucket(r[0]) != 0]
    dev = [r for r in rows if _bucket(r[0]) == 0]

    vocab = build_vocab()
    tr_ids, tr_labels, tr_mask = _featurized(train, vocab)
    dv_ids, dv_labels, dv_mask = _featurized(dev, vocab)

    if tr_ids:
        masked = np.asarray(tr_labels)[np.asarray(tr_mask).astype(bool)]
        freq = np.bincount(masked, minlength=NUM_LABELS)
    else:
        freq = np.zeros(NUM_LABELS, dtype=np.int64)

    weights = get_weights()
    g, r = accumulate_gram(tr_ids, tr_labels, tr_mask, weights, class_weights_sq(freq))

    best = None
    for l2 in l2_grid:
        pw, pb = solve_ridge(g, r, l2)
        n, correct = count_correct(dv_ids, dv_labels, dv_mask, weights, pw, pb)
        acc = correct / max(n, 1)
        # strict >: earliest λ wins ties, same as fit_select_l2
        if best is None or acc > best[1]:
            best = (l2, acc)

    out = [(f"freq_{lab}", float(freq[i])) for i, lab in enumerate(LABELS)]
    out += [("best_l2", float(best[0])), ("dev_masked_accuracy", round(float(best[1]), 6))]
    return sorted(out)


def crf_fit_frame(sf_dir: str):
    """→ pandas DataFrame with the query's exact schema."""
    import pandas as pd

    df = pd.DataFrame(crf_fit_rows(sf_dir), columns=["metric", "value"])
    return df.astype({"value": "float64"})
