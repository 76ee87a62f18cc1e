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


class _Buffers:
    """Per-process reusable scratch buffers for the encode hot path.

    Fresh numpy allocations per sub-batch mean fresh kernel pages every
    call; inside a lazily-backed VM each first-touch page faults through
    the hypervisor, and 32 concurrent workers serialize on kernel memory
    locks (measured: 97-100% system time, 2-4× wall blowup). Allocating
    once per worker and slicing views per call removes the fault storm.
    Grows monotonically to the largest shape seen.
    """

    def __init__(self) -> None:
        self.rows = 0
        self.pad_rows = 0

    def ensure(self, rows: int, pad_rows: int) -> None:
        if rows > self.rows:
            self.rows = rows
            self.ctx = np.empty((rows, IN_DIM), dtype=np.float32)
            self.h1 = np.empty((rows, HIDDEN), dtype=np.float32)
            self.h2 = np.empty((rows, HIDDEN), dtype=np.float32)
        if pad_rows > self.pad_rows:
            self.pad_rows = pad_rows
            self.padded = np.zeros((pad_rows, EMB_DIM), dtype=np.float32)


_BUFS = _Buffers()


def encode_parts(
    input_ids: np.ndarray, weights: dict[str, np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """[B, T] int ids → (h2 [B·T, HIDDEN], ctx [B·T, IN_DIM]) encoder states.

    Char embedding lookup, ±WINDOW window concat (zero-padded edges),
    two tanh dense layers, with the window-concat input carried along a
    residual stream into the head features (transformer-style residual).
    Returned as separate 2-D parts into REUSED scratch buffers (see
    _Buffers): the parts stay separate because concatenating them into
    one [·, HEAD_DIM] matrix is a >100 MB copy per batch — the
    projection splits across the parts instead. Callers must consume
    the views before the next encode_parts call.
    """
    b, t = input_ids.shape
    tp = t + 2 * WINDOW
    _BUFS.ensure(b * t, b * tp)
    padded3 = _BUFS.padded[: b * tp].reshape(b, tp, EMB_DIM)
    padded3[:, :WINDOW] = 0.0
    padded3[:, WINDOW + t :] = 0.0
    np.take(weights["emb"], input_ids, axis=0, out=padded3[:, WINDOW : WINDOW + t])
    ctx = _BUFS.ctx[: b * t]
    ctx3 = ctx.reshape(b, t, IN_DIM)
    for k in range(2 * WINDOW + 1):
        ctx3[:, :, k * EMB_DIM : (k + 1) * EMB_DIM] = padded3[:, k : k + t]
    h1 = _BUFS.h1[: b * t]
    np.matmul(ctx, weights["w1"], out=h1)
    h1 += weights["b1"]
    np.tanh(h1, out=h1)
    h2 = _BUFS.h2[: b * t]
    np.matmul(h1, weights["w2"], out=h2)
    h2 += weights["b2"]
    np.tanh(h2, out=h2)
    return h2, ctx


def encode_hidden(input_ids: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """[B, T] → [B, T, HEAD_DIM] full head features (training path only —
    the ridge fit wants one design matrix; inference uses encode_parts)."""
    b, t = input_ids.shape
    h2, ctx = encode_parts(input_ids, weights)
    return np.concatenate([h2, ctx], axis=-1).reshape(b, t, HEAD_DIM)


def encode_hidden64(input_ids: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """float64 twin of ``encode_hidden`` for the FIT path (operators/
    fit.py) and its independent numpy oracle (oracle/fit.py).

    float32 GEMM results vary with batch shape (~1e-7), so a float32
    distributed fit only matches a single-pass numpy fit to ~1e-3
    relative weights and ≥0.999 decode agreement — too loose for a
    round-to-6 golden-parquet oracle on dev accuracy.  In float64 the
    batch-shape/summation-order noise is ~1e-16, far below any argmax
    margin, so the distributed fit and the oracle fit land on the SAME
    accuracy counts.  Per-position arithmetic mirrors the folded-table
    inference path: h1 via per-slot gathers into the _Folded64 tables
    (fixed slot order), ctx via emb64 gathers, two tanh layers.
    Training throughput is Gram-pass-bound, not encode-bound, so the
    2× float64 GEMM cost is irrelevant at the fit's scale."""
    f = folded64(weights)
    b, t = input_ids.shape
    n = b * t
    k_slots = 2 * WINDOW + 1
    idp = np.full((b, t + 2 * WINDOW), f.v, dtype=np.int64)
    idp[:, WINDOW : WINDOW + t] = input_ids
    h1 = np.zeros((n, HIDDEN), dtype=np.float64)
    ctx = np.empty((n, IN_DIM), dtype=np.float64)
    for k in range(k_slots):
        ids_k = np.ascontiguousarray(idp[:, k : k + t]).reshape(n)
        h1 += f.g64[k][ids_k]
        ctx[:, k * EMB_DIM : (k + 1) * EMB_DIM] = f.emb64[ids_k]
    h1 += f.b1
    np.tanh(h1, out=h1)
    h2 = h1 @ f.w2
    h2 += f.b2
    np.tanh(h2, out=h2)
    return np.concatenate([h2, ctx], axis=1).reshape(b, t, HEAD_DIM)


class _FoldedTables:
    """First-layer and residual-projection folding (per-process cache).

    ``ctx @ W1`` over the 7-slot window concat equals
    ``Σ_k emb[char_{p+k-3}] @ W1_k`` (block matmul), so we precompute
    per-char tables ``G_k = emb @ W1_k`` (and ``P_k = emb @ Pctx_k`` for
    the residual half of the projection). Inference then replaces the
    widest GEMM and the window-concat copy with gathers into ~25 MB of
    read-only tables that stay LLC-resident — measured 3× faster
    single-core and, critically, ~4× less DRAM traffic per position,
    which is what lets 32 concurrent workers scale (the GEMM/concat
    formulation saturated the VM's memory bandwidth at ~8 workers).

    Row V (one past the vocab) is an all-zero virtual char encoding the
    zero-vector edge padding of the window.
    """

    def __init__(self, weights: dict[str, np.ndarray]):
        v = weights["emb"].shape[0]
        c = weights["proj_b"].shape[0]
        k_slots = 2 * WINDOW + 1
        self.v = v
        self.g = np.zeros((k_slots, v + 1, HIDDEN), dtype=np.float32)
        self.p = np.zeros((k_slots, v + 1, c), dtype=np.float32)
        for k in range(k_slots):
            w1_k = weights["w1"][k * EMB_DIM : (k + 1) * EMB_DIM]
            self.g[k, :v] = weights["emb"] @ w1_k
            p_k = weights["proj_w"][HIDDEN + k * EMB_DIM : HIDDEN + (k + 1) * EMB_DIM]
            self.p[k, :v] = weights["emb"] @ p_k


_FOLD_CACHE: dict[tuple, _FoldedTables] = {}

_TILE = 512  # positions per fused tile: h1/h2 tiles stay L2-resident


class _Folded64:
    """float64 twin of _FoldedTables for heads that report continuous
    scores (MRC span log-probs, NRE relation probabilities).

    float32 BLAS table builds differ across processes (thread count,
    load-time kernel dispatch), so float32 tables built on the driver
    vs a Spark worker diverge at ~1e-7 — enough to flip a round-to-6
    oracle value.  Discrete heads (Viterbi) tolerate that; continuous
    heads use these float64 tables (noise ~1e-16).  Row V is the zero
    virtual char for window edge padding."""

    def __init__(self, weights: dict[str, np.ndarray]):
        emb = weights["emb"].astype(np.float64)
        v = emb.shape[0]
        self.v = v
        self.emb64 = np.zeros((v + 1, EMB_DIM), dtype=np.float64)
        self.emb64[:v] = emb
        k_slots = 2 * WINDOW + 1
        w1 = weights["w1"].astype(np.float64)
        self.g64 = np.zeros((k_slots, v + 1, HIDDEN), dtype=np.float64)
        for k in range(k_slots):
            self.g64[k, :v] = emb @ w1[k * EMB_DIM : (k + 1) * EMB_DIM]
        self.w2 = weights["w2"].astype(np.float64)
        self.b1 = weights["b1"].astype(np.float64)
        self.b2 = weights["b2"].astype(np.float64)


_FOLD64_CACHE: dict[tuple, _Folded64] = {}


def folded64(weights: dict[str, np.ndarray]) -> _Folded64:
    # content key, not id(): the MRC and NRE weight dicts are separate
    # npz loads of the SAME encoder — id-keying would rebuild the 46 MB
    # tables on every head switch within a session
    emb = weights["emb"]
    # _Folded64 folds the ENCODER only (emb, w1, w2, b1, b2 — no proj):
    # the key samples every one of those arrays
    key = (
        emb.shape,
        emb[0, :8].tobytes(),
        emb[-1, :8].tobytes(),
        weights["w1"][0, :8].tobytes(),
        weights["w2"][0, :8].tobytes(),
        weights["b1"][:8].tobytes(),
        weights["b2"][:8].tobytes(),
    )
    f = _FOLD64_CACHE.get(key)
    if f is None:
        _FOLD64_CACHE.clear()
        f = _Folded64(weights)
        _FOLD64_CACHE[key] = f
    return f


def _folded(weights: dict[str, np.ndarray]) -> _FoldedTables:
    # content key over EVERY folded array — id(emb) alone served stale
    # tables when two weight dicts shared the encoder but differed in
    # the projection (e.g. a freshly fitted proj_w beside the base
    # weights: same emb object, different fold), the stale-cache class
    # the round-2 ADVICE flagged for the MRC fold cache
    emb, pw = weights["emb"], weights["proj_w"]
    key = (
        emb.shape + pw.shape,
        emb[0, :8].tobytes(),
        emb[-1, :8].tobytes(),
        pw[0, :8].tobytes(),
        pw[-1, -8:].tobytes(),
        weights["proj_b"][:8].tobytes(),
        weights["w1"][0, :8].tobytes(),
    )
    ft = _FOLD_CACHE.get(key)
    if ft is None:
        ft = _FoldedTables(weights)
        _FOLD_CACHE.clear()  # one weights set per process in practice
        _FOLD_CACHE[key] = ft
    return ft


def encode_logits(input_ids: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """[B, T] → [B, T, C] per-token tag logits (projection of crf_albert.py:135-143).

    Folded-table formulation (see _FoldedTables), position-tiled so the
    per-tile activations never leave cache. Per-row deterministic: the
    per-position result depends only on that position's window of char
    ids (gather + fixed-order adds + fixed-shape GEMMs)."""
    ft = _folded(weights)
    b, t = input_ids.shape
    n = b * t
    c = weights["proj_b"].shape[0]
    k_slots = 2 * WINDOW + 1

    idp = np.full((b, t + 2 * WINDOW), ft.v, dtype=np.int32)
    idp[:, WINDOW : WINDOW + t] = input_ids
    idx = [np.ascontiguousarray(idp[:, k : k + t]).reshape(n) for k in range(k_slots)]

    logits = np.empty((n, c), dtype=np.float32)
    # zeros-init: short tiles run the GEMMs over the FULL tile buffer
    # (constant shape → same BLAS kernel/k-order per row regardless of
    # batch composition — a [m,256] gemv kernel rounds differently than
    # the [512,256] gemm kernel, which would break per-row determinism);
    # stale rows beyond m are finite garbage whose results are discarded.
    h1 = np.zeros((_TILE, HIDDEN), dtype=np.float32)
    tmp = np.zeros((_TILE, HIDDEN), dtype=np.float32)
    lt = np.zeros((_TILE, c), dtype=np.float32)
    w2 = weights["w2"]
    b1, b2, pb = weights["b1"], weights["b2"], weights["proj_b"]
    ph = weights["proj_w"][:HIDDEN]
    for lo in range(0, n, _TILE):
        hi = min(lo + _TILE, n)
        m = hi - lo
        h1v, tmpv = h1[:m], tmp[:m]
        np.take(ft.g[0], idx[0][lo:hi], axis=0, out=h1v)
        for k in range(1, k_slots):
            np.take(ft.g[k], idx[k][lo:hi], axis=0, out=tmpv)
            h1v += tmpv
        h1v += b1
        np.tanh(h1v, out=h1v)
        np.matmul(h1, w2, out=tmp)
        tmpv += b2
        np.tanh(tmpv, out=tmpv)
        np.matmul(tmp, ph, out=lt)
        out = logits[lo:hi]
        out[:] = lt[:m]
        for k in range(k_slots):
            out += ft.p[k][idx[k][lo:hi]]
        out += pb
    return logits.reshape(b, t, c)


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
