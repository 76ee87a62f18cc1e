"""Surrogate encoder + CRF Viterbi decode (M1/M2) — pure numpy.

The reference's compute kernel is ALBERT encode → dense projection →
per-token logits (``crf_albert.py:108-145``) with a CRF transition
matrix used in training (``crf_albert.py:147-168``; inference there is
argmax, ``crf_albert.py:145``). Per [NORTH] our decode is Viterbi over
(logits, transitions). The surrogate keeps the reference's *shape*
(char embedding → stacked dense encoder → ``xw_plus_b`` projection →
``[B, T, C]`` logits → decode) at toy size, with deterministic seeded
weights shared verbatim between the single-node oracle and the Spark
``mapInPandas`` stage (broadcast once, applied batch-wise) — so
pipeline-vs-oracle triple P/R is exactly reproducible.

Everything here is batch-vectorized numpy: no per-row Python in the hot
path beyond the O(T) Viterbi recursion, which is vectorized across the
batch dimension.
"""

from __future__ import annotations

import numpy as np

EMB_DIM = 96
HIDDEN = 256
WINDOW = 3  # context chars each side → receptive field 7
IN_DIM = EMB_DIM * (2 * WINDOW + 1)
HEAD_DIM = HIDDEN + IN_DIM  # residual stream: [h2, ctx]


def init_encoder_weights(vocab_size: int, num_labels: int, seed: int = 42) -> dict[str, np.ndarray]:
    """Deterministic random encoder weights (xavier-ish scaling).

    The embedding is later given 'pretrained' structure (semantic
    cluster directions per char role) by ``artifacts.get_weights`` —
    real pretrained char embeddings cluster by semantics the same way.
    """
    rng = np.random.default_rng(seed)

    def xavier(shape: tuple[int, int]) -> np.ndarray:
        bound = np.sqrt(6.0 / (shape[0] + shape[1]))
        return rng.uniform(-bound, bound, size=shape).astype(np.float32)

    return {
        "emb": rng.standard_normal((vocab_size, EMB_DIM)).astype(np.float32) * 0.5,
        "w1": xavier((IN_DIM, HIDDEN)),
        "b1": rng.uniform(-0.5, 0.5, HIDDEN).astype(np.float32),
        "w2": xavier((HIDDEN, HIDDEN)),
        "b2": rng.uniform(-0.5, 0.5, HIDDEN).astype(np.float32),
        # projection (crf_albert.py:135-143 shape) — ridge-fit later
        "proj_w": np.zeros((HEAD_DIM, num_labels), dtype=np.float32),
        "proj_b": np.zeros(num_labels, dtype=np.float32),
        "trans": np.zeros((num_labels, num_labels), dtype=np.float32),
    }


def encode_hidden(input_ids: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """[B, T] int ids → [B, T, HEAD_DIM] encoder states.

    Char embedding lookup, ±WINDOW window concat (zero-padded edges),
    two tanh dense layers, with the window-concat input carried along a
    residual stream into the head features (transformer-style residual).
    """
    emb = weights["emb"][input_ids]  # [B, T, E]
    b, t, e = emb.shape
    padded = np.zeros((b, t + 2 * WINDOW, e), dtype=emb.dtype)
    padded[:, WINDOW : WINDOW + t] = emb
    ctx = np.concatenate([padded[:, k : k + t] for k in range(2 * WINDOW + 1)], axis=-1)
    h1 = np.tanh(ctx @ weights["w1"] + weights["b1"])
    h2 = np.tanh(h1 @ weights["w2"] + weights["b2"])
    return np.concatenate([h2, ctx], axis=-1)


def encode_logits(input_ids: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """[B, T] → [B, T, C] per-token tag logits (projection of crf_albert.py:135-143)."""
    h = encode_hidden(input_ids, weights)
    return h @ weights["proj_w"] + weights["proj_b"]


def encode_logits_trimmed(
    full_input_ids: np.ndarray, tmax: int, weights: dict[str, np.ndarray]
) -> np.ndarray:
    """Batch-composition-INVARIANT trimmed logits: [B, 384] + tmax → [B, tmax, C].

    Trimming a batch to its max real length must not change any row's
    logits vs the full-length computation: positions near ``tmax`` still
    need the real ``[PAD]``-token context (id 0 has a nonzero embedding),
    not the zero-vector edge padding. So compute over ``tmax + WINDOW``
    columns and slice. Without this margin, a record's tags depend on
    which batch it landed in (the longest record per batch saw zero
    context) — a determinism bug under repartitioning/retries.
    """
    t_full = full_input_ids.shape[1]
    t_in = min(tmax + WINDOW, t_full)
    logits = encode_logits(full_input_ids[:, :t_in], weights)
    return logits[:, :tmax]


def make_bio_transitions(labels: list[str], valid: float = 0.0, invalid: float = -1e4) -> np.ndarray:
    """CRF transition matrix enforcing suffix-BIO validity.

    ``X-I`` may only follow ``X-B`` or ``X-I``; every other transition
    scores ``valid``. Shape per crf_albert.py:155-158.
    """
    from .labels import bio_split

    n = len(labels)
    trans = np.full((n, n), valid, dtype=np.float32)
    for j, lab_to in enumerate(labels):
        typ_to, pos_to = bio_split(lab_to)
        if pos_to != "I":
            continue
        for i, lab_from in enumerate(labels):
            typ_from, pos_from = bio_split(lab_from)
            if not (typ_from == typ_to and pos_from in ("B", "I")):
                trans[i, j] = invalid
    return trans


def viterbi_decode(logits: np.ndarray, lengths: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Batched Viterbi: [B, T, C] logits + [B] lengths → [B, T] tag ids.

    Vectorized across the batch; positions ≥ length get tag 0. The
    recursion is the standard max-product DP over ``trans[i, j]`` =
    score(i → j).
    """
    bsz, t, c = logits.shape
    if t == 0:
        return np.zeros((bsz, 0), dtype=np.int64)
    dp = logits[:, 0, :].astype(np.float64).copy()  # [B, C]
    back = np.zeros((bsz, t, c), dtype=np.int32)
    for step in range(1, t):
        # scores[b, i, j] = dp[b, i] + trans[i, j]
        scores = dp[:, :, None] + trans[None, :, :]
        best_prev = scores.argmax(axis=1)  # [B, C]
        best_score = np.take_along_axis(scores, best_prev[:, None, :], axis=1)[:, 0, :]
        new_dp = best_score + logits[:, step, :]
        # freeze rows whose sequence already ended
        active = (lengths > step)[:, None]
        dp = np.where(active, new_dp, dp)
        back[:, step, :] = np.where(active, best_prev, 0)

    paths = np.zeros((bsz, t), dtype=np.int64)
    last = np.maximum(lengths - 1, 0)
    # best final state per row, evaluated at each row's own last position
    best_last = dp.argmax(axis=1)  # [B]
    paths[np.arange(bsz), last] = best_last
    for step in range(t - 1, 0, -1):
        prev = back[np.arange(bsz), step, paths[:, step]]
        take = lengths - 1 >= step
        paths[:, step - 1] = np.where(take, prev, paths[:, step - 1])
    return paths


def fit_projection(
    weights: dict[str, np.ndarray],
    input_ids: np.ndarray,
    label_ids: np.ndarray,
    mask: np.ndarray,
    l2: float = 1e-2,
    class_weight_pow: float = 0.3,
) -> None:
    """Closed-form weighted ridge fit of the projection onto gold BIO tags.

    Deterministic "training": freeze the random encoder, solve
    ``min ||√S (X W - Y)||² + λ||W||²`` for one-hot targets Y over
    masked positions, with per-sample weights S softening the O-class
    imbalance (``freq^-class_weight_pow``). An extreme-learning-machine
    fit — bit-reproducible, no SGD. Mutates ``weights`` in place.
    """
    h = encode_hidden(input_ids, weights)  # [B, T, HEAD_DIM]
    sel = mask.astype(bool)
    x = h[sel].astype(np.float64)  # [N, D]
    y_idx = label_ids[sel]
    num_labels = weights["trans"].shape[0]
    y = np.zeros((x.shape[0], num_labels), dtype=np.float64)
    # scale targets so logit gaps dominate transition scores
    y[np.arange(x.shape[0]), y_idx] = 10.0
    freq = np.bincount(y_idx, minlength=num_labels).astype(np.float64)
    sw = (freq.sum() / (freq + 1.0))[y_idx] ** class_weight_pow
    sw = np.sqrt(sw / sw.min())[:, None]
    xb = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)
    xw = xb * sw
    gram = xw.T @ xw + l2 * np.eye(xb.shape[1])
    sol = np.linalg.solve(gram, xw.T @ (y * sw))
    weights["proj_w"] = sol[:-1].astype(np.float32)
    weights["proj_b"] = sol[-1].astype(np.float32)
