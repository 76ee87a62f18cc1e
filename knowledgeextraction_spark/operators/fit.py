"""Distributed closed-form training of the CRF projection (F17/W8 analog).

The reference's one capability with no engine analog so far was the
estimator train/eval loop (``run_crf_albert.py:150-347``, LR schedule
F17, best-checkpoint election W8).  The surrogate model's "training" is
a weighted ridge fit (core/model.py:fit_projection — deterministic,
closed-form), and a ridge fit distributes exactly: the Gram and moment
matrices are sums over training positions, so each partition
featurizes → encodes → accumulates its partial ``Gᵖ = Σ w²·x xᵀ`` and
``Rᵖ = Σ w²·x yᵀ`` locally, the driver adds the ``#partitions``
fixed-size partials ([D+1, D+1], D = HEAD_DIM) and solves once.  Two
narrow passes, no shuffle of training rows at all:

1. label-frequency pass (featurize only — no model math) → the global
   class weights the single-node fit derives from ``bincount``;
2. Gram pass (featurize + encode + accumulate) → one partial per
   partition.

The per-partition accumulators are dense [929, 929] float64 matrices —
per-partition imperative state, which is the one case SURVEY.md §3
reserves for RDD-level code; everything upstream of the fit stays
DataFrames.  Up to ``TREE_THRESHOLD`` partitions the partials are
summed on the driver in partition order (deterministic); beyond it
(driver memory = #partitions × ~7 MB otherwise) they tree-combine on
executors (``treeReduce``), accepting ±1e-15 combine-order noise —
below float32 weight resolution, and the parity test passes under a
forced threshold of 1.

The fit path encodes in float64 (core/model.py:encode_hidden64), so
distributed-vs-single-pass noise is only summation order (~1e-15) —
that is what lets the driver query carry a golden-parquet oracle from
the independent single-pass numpy fit (oracle/fit.py) with bit-stable
round-to-6 values.  Parity with the float32 single-node trainer
(core/model.py:fit_projection, which feeds the committed .artifacts
weights) remains approximate: float32 GEMM results vary with batch
shape (~1e-7), so tests/test_fit_distributed.py asserts weight
agreement at 1e-3 relative and decode agreement on held-out pages.

W8 (best-checkpoint election) is ``fit_select_l2``: fit one model per
λ on the train split, score masked accuracy on a held-out dev split,
keep the argmax — the reference's keep-best-eval loop re-expressed as
a deterministic grid over closed-form fits.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..core.bio import bio_tag
from ..core.featurize import convert_single_example
from ..core.labels import NUM_LABELS
from ..core.model import HEAD_DIM, encode_hidden64
from ..core.packing import pack_sentences
from ..core.vocab import build_vocab

ENCODE_BATCH = 64
# above this many partitions, Gram partials tree-combine on executors
# instead of being collected (driver memory is the constraint: each
# partial is a dense [HEAD_DIM+1, HEAD_DIM+1] float64 ≈ 7 MB)
TREE_THRESHOLD = 64

# input schema for training records: per-text gold entity spans
TRAIN_SCHEMA = (
    "text string, "
    "ents array<struct<label: string, start: int, end: int>>"
)


def _featurized(rows, vocab):
    """Iterate (text, ents) rows → (input_ids, label_ids, mask) lists."""
    ids_rows, label_rows, mask_rows = [], [], []
    for text, ents in rows:
        ents = [(e["label"], e["start"], e["end"]) for e in (ents or [])]
        for rec_text, rec_ents in pack_sentences(text, sorted(ents, key=lambda x: (x[1], x[2]))):
            tags = bio_tag(len(rec_text), rec_ents)
            input_ids, input_mask, _seg, label_ids = convert_single_example(
                rec_text, tags, vocab=vocab
            )
            ids_rows.append(input_ids)
            label_rows.append(label_ids)
            mask_rows.append(input_mask)
    return ids_rows, label_rows, mask_rows


def weak_label_surfaces() -> tuple[str, dict[str, str]]:
    """→ (regex pattern, surface → label_type): longest-match-first
    alternation over the doc-world dictionary surfaces.  Shared by the
    driver query (queries.q_crf_fit_distributed) and the independent
    oracle fit (oracle/fit.py) so both weak-label IDENTICALLY —
    including the dict's last-wins tie-break for surfaces that carry
    two label types."""
    import re

    from ..sources import pages as ps

    entities, _ = ps.dictionary()
    surface_label = sorted(
        {
            (s, e.label_type)
            for e in entities
            for s in [e.canonical_name, *e.aliases]
        },
        key=lambda t: (-len(t[0]), t[0]),  # longest-match-first alternation
    )
    pattern = "|".join(re.escape(s) for s, _ in surface_label)
    return pattern, dict(surface_label)


def class_weights_sq(freq: np.ndarray, class_weight_pow: float = 0.3) -> np.ndarray:
    """Squared per-class sample weights from label frequencies (the
    single-node fit's class weighting, shared with the numpy oracle)."""
    sw_raw = (freq.sum() / (freq + 1.0)) ** class_weight_pow
    return sw_raw / sw_raw.min()


def accumulate_gram(
    ids_rows, label_rows, mask_rows, weights, sw2_class
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy Gram/moment accumulation over featurized rows in
    ``ENCODE_BATCH`` chunks — the shared kernel of the per-partition
    closure below AND the independent oracle fit (oracle/fit.py).
    float64 end to end (encode_hidden64), so accumulation-order noise
    is ~1e-16 and the distributed and single-pass results agree to
    golden-oracle precision."""
    d = HEAD_DIM + 1
    g = np.zeros((d, d), dtype=np.float64)
    r = np.zeros((d, NUM_LABELS), dtype=np.float64)
    for i in range(0, len(ids_rows), ENCODE_BATCH):
        ids = np.asarray(ids_rows[i : i + ENCODE_BATCH], dtype=np.int64)
        labels = np.asarray(label_rows[i : i + ENCODE_BATCH])
        mask = np.asarray(mask_rows[i : i + ENCODE_BATCH]).astype(bool)
        h = encode_hidden64(ids, weights)
        x = h[mask]
        y_idx = labels[mask]
        xb = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)
        w2 = sw2_class[y_idx][:, None]
        xw2 = xb * w2
        g += xb.T @ xw2
        y = np.zeros((x.shape[0], NUM_LABELS), dtype=np.float64)
        y[np.arange(x.shape[0]), y_idx] = 10.0
        r += xw2.T @ y
    return g, r


def solve_ridge(g: np.ndarray, r: np.ndarray, l2: float) -> tuple[np.ndarray, np.ndarray]:
    """(G, R, λ) → (proj_w float32 [D, C], proj_b float32 [C])."""
    d = HEAD_DIM + 1
    sol = np.linalg.solve(g + l2 * np.eye(d), r)
    return sol[:-1].astype(np.float32), sol[-1].astype(np.float32)


def count_correct(
    ids_rows, label_rows, mask_rows, weights, pw, pb
) -> tuple[int, int]:
    """(n_masked_positions, n_correct) under argmax-logit tagging —
    the shared eval kernel (float64 logits, see accumulate_gram)."""
    pw = np.asarray(pw, dtype=np.float64)
    pb = np.asarray(pb, dtype=np.float64)
    n = correct = 0
    for i in range(0, len(ids_rows), ENCODE_BATCH):
        ids = np.asarray(ids_rows[i : i + ENCODE_BATCH], dtype=np.int64)
        labels = np.asarray(label_rows[i : i + ENCODE_BATCH])
        mask = np.asarray(mask_rows[i : i + ENCODE_BATCH]).astype(bool)
        h = encode_hidden64(ids, weights)
        pred = (h[mask] @ pw + pb).argmax(axis=1)
        n += pred.shape[0]
        correct += int((pred == labels[mask]).sum())
    return n, correct


def label_frequencies(records: DataFrame) -> np.ndarray:
    """Pass 1: global masked-position label counts (no model math)."""
    def part(rows):
        vocab = build_vocab()
        counts = np.zeros(NUM_LABELS, dtype=np.int64)
        ids_rows, label_rows, mask_rows = _featurized(
            ((r["text"], r["ents"]) for r in rows), vocab
        )
        if ids_rows:
            labels = np.asarray(label_rows)[np.asarray(mask_rows).astype(bool)]
            counts += np.bincount(labels, minlength=NUM_LABELS)
        yield counts

    partials = records.select("text", "ents").rdd.mapPartitions(part).collect()
    return np.sum(partials, axis=0) if partials else np.zeros(NUM_LABELS, np.int64)


def _gram_partials(
    records: DataFrame,
    weights_bc,
    sw2_class: np.ndarray,
    tree_threshold: int = TREE_THRESHOLD,
):
    """Pass 2: (G, R) partials over encoded masked positions — a list of
    per-partition (idx, G, R) when the partition count is driver-
    collectable, else ONE pre-combined (0, G, R) from an executor-side
    ``treeReduce``."""

    def part(idx, rows):
        vocab = build_vocab()
        weights = weights_bc.value
        ids_rows, label_rows, mask_rows = _featurized(
            ((row["text"], row["ents"]) for row in rows), vocab
        )
        g, r = accumulate_gram(ids_rows, label_rows, mask_rows, weights, sw2_class)
        yield idx, g, r

    rdd = records.select("text", "ents").rdd
    partials = rdd.mapPartitionsWithIndex(part)
    if rdd.getNumPartitions() <= tree_threshold:
        return partials.collect()
    combined = partials.map(lambda t: (t[1], t[2])).treeReduce(
        lambda a, b: (a[0] + b[0], a[1] + b[1]), depth=3
    )
    return [(0, combined[0], combined[1])]


def distributed_ridge_fit(
    records: DataFrame,
    weights_bc,
    l2: float = 1e-2,
    class_weight_pow: float = 0.3,
    tree_threshold: int = TREE_THRESHOLD,
    _partials_cache: list | None = None,
    _freq: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (proj_w float32 [D, C], proj_b float32 [C]) — the distributed
    twin of core/model.py:fit_projection (same class weighting, same
    target scaling, same regularized solve)."""
    freq = label_frequencies(records) if _freq is None else _freq
    sw2_class = class_weights_sq(freq, class_weight_pow)

    partials = (
        _gram_partials(records, weights_bc, sw2_class, tree_threshold)
        if _partials_cache is None
        else _partials_cache
    )
    d = HEAD_DIM + 1
    g = np.zeros((d, d), dtype=np.float64)
    r = np.zeros((d, NUM_LABELS), dtype=np.float64)
    for _idx, gp, rp in sorted(partials, key=lambda t: t[0]):
        g += gp
        r += rp
    return solve_ridge(g, r, l2)


def masked_accuracy(records: DataFrame, weights_bc, proj_w, proj_b) -> float:
    """Dev-split scorer for W8 selection: argmax-logit tag accuracy over
    masked positions (the estimator's eval metric, crf_albert.py:79-87;
    Viterbi is unnecessary for model selection)."""
    pw = np.asarray(proj_w)
    pb = np.asarray(proj_b)

    def part(rows):
        vocab = build_vocab()
        weights = weights_bc.value
        ids_rows, label_rows, mask_rows = _featurized(
            ((row["text"], row["ents"]) for row in rows), vocab
        )
        n, correct = count_correct(
            ids_rows, label_rows, mask_rows, weights, pw, pb
        )
        yield np.array([n, correct], dtype=np.int64)

    partials = records.select("text", "ents").rdd.mapPartitions(part).collect()
    tot = np.sum(partials, axis=0) if partials else np.zeros(2, np.int64)
    return float(tot[1]) / max(int(tot[0]), 1)


def fit_select_l2(
    train: DataFrame,
    dev: DataFrame,
    weights_bc,
    l2_grid: tuple[float, ...] = (1e-3, 1e-2, 1e-1),
    class_weight_pow: float = 0.3,
    freq: np.ndarray | None = None,
):
    """W8 best-checkpoint election: one closed-form fit per λ (the Gram
    partials are computed ONCE and re-solved per λ — the expensive
    distributed passes don't repeat), dev masked accuracy per fit, keep
    the argmax.  → (best_l2, best_acc, proj_w, proj_b, per-λ accs).
    Pass ``freq`` to reuse an already-computed label-frequency pass."""
    if freq is None:
        freq = label_frequencies(train)
    sw2_class = class_weights_sq(freq, class_weight_pow)
    partials = _gram_partials(train, weights_bc, sw2_class)

    best = None
    accs = {}
    for l2 in l2_grid:
        pw, pb = distributed_ridge_fit(
            train, weights_bc, l2, class_weight_pow,
            _partials_cache=partials, _freq=freq,
        )
        acc = masked_accuracy(dev, weights_bc, pw, pb)
        accs[l2] = acc
        if best is None or acc > best[1]:
            best = (l2, acc, pw, pb)
    return (*best, accs)
