"""MRC (NER-as-reading-comprehension) span model — numpy core (M4).

Mirrors the reference's second serving entry point:

- featurization: ``mrc_utils.py:116-348`` (query truncation to
  ``max_query_length`` = P5, ``[CLS] query [SEP] span [SEP]`` layout,
  sliding doc spans with ``doc_stride``) and ``mrc_processor.py:25-52``
  (SQuAD-style {id, question, context} examples).  The reference
  LCS-aligns sentencepiece tokens back to original chars
  (``mrc_utils.py:163-230`` — reimplemented as banded LCS in
  core/align.py); the surrogate tokenizes per CHAR like the CRF path
  (``crf_utils.py:150-163``), so tok↔orig is the identity map and the
  align stage is exercised by its own parity tests.
- model: ``mrc_albert.py:82-150`` — start/end/cls heads.  The surrogate
  keeps the architecture's *interfaces* (start_top_log_probs /
  start_top_index / end_top per start / cls_logits, start_n_top =
  end_n_top = 5) over the shared ELM encoder (core/model.py), with the
  question's entity type one-hot appended to the head features (the
  window-local encoder cannot propagate the query to distant context
  positions the way full attention does).
- accumulation + n-best: ``squad_utils.accumulate_predictions_v2`` and
  ``mrc_utils.get_predictions_v2`` (:350-464): validity filters
  (inside-context, end ≥ start, length ≤ max_answer_length = W9's
  30-cap), per-(start,end) logprob averaging, sort by summed log prob,
  text dedup keep-first, n_best cut, softmax, mean-cls score_diff.

Config values from the reference: config/mrc_processor.json (max_query
64, max_seq 384, stride 128 per mrc_albert_model.json) and
config/mrc_albert_model.json (n_best 20, max_answer 30, top-5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .labels import ENTITY_TYPES
from .model import EMB_DIM, HIDDEN, WINDOW, folded64
from .vocab import CLS_ID, SEP_ID, UNK_ID, build_vocab

MAX_QUERY_LENGTH = 64   # config/mrc_processor.json
MAX_SEQ_LENGTH = 384    # config/mrc_processor.json
DOC_STRIDE = 128        # config/mrc_albert_model.json
N_BEST_SIZE = 20        # config/mrc_albert_model.json
MAX_ANSWER_LENGTH = 30  # config/mrc_albert_model.json (W9)
START_N_TOP = 5         # config/mrc_albert_model.json
END_N_TOP = 5           # config/mrc_albert_model.json

N_TYPES = len(ENTITY_TYPES)
TYPE_INDEX = {t: i for i, t in enumerate(ENTITY_TYPES)}

# question text per entity type (the MRC query; zh-style "find the X")
QUESTIONS = {t: f"找出{t}实体" for t in ENTITY_TYPES}


@dataclass(frozen=True)
class MRCFeature:
    """One doc-span feature of an example (mrc_utils.py:318-348)."""

    span_index: int
    span_start: int      # char offset of the span in the context
    span_length: int
    doc_offset: int      # position of the first context char in input_ids
    input_ids: tuple     # length MAX_SEQ_LENGTH
    input_len: int       # real (non-pad) length


def featurize_example(
    question: str,
    context: str,
    vocab: dict[str, int] | None = None,
    max_seq_length: int = MAX_SEQ_LENGTH,
    doc_stride: int = DOC_STRIDE,
    max_query_length: int = MAX_QUERY_LENGTH,
) -> list[MRCFeature]:
    """(question, context) → doc-span features.

    Layout per feature: [CLS] q_1..q_Q [SEP] c_i..c_j [SEP] pad...
    Query truncated to ``max_query_length`` (P5, mrc_utils.py:125-127);
    spans of at most ``max_seq_length - Q - 3`` chars advance by
    ``min(doc_stride, remaining)`` (mrc_utils.py:300-316 semantics).
    """
    if vocab is None:
        vocab = build_vocab()
    q_ids = [vocab.get(ch, UNK_ID) for ch in question][:max_query_length]
    max_span_len = max_seq_length - len(q_ids) - 3
    assert max_span_len > 0

    spans: list[tuple[int, int]] = []
    start = 0
    n = len(context)
    while True:
        length = min(max_span_len, n - start)
        spans.append((start, length))
        if start + length >= n:
            break
        start += min(doc_stride, length)

    feats = []
    for k, (s, ln) in enumerate(spans):
        ids = [CLS_ID] + q_ids + [SEP_ID]
        doc_offset = len(ids)
        ids += [vocab.get(ch, UNK_ID) for ch in context[s : s + ln]]
        ids.append(SEP_ID)
        real = len(ids)
        ids += [0] * (max_seq_length - real)
        feats.append(
            MRCFeature(
                span_index=k,
                span_start=s,
                span_length=ln,
                doc_offset=doc_offset,
                input_ids=tuple(ids),
                input_len=real,
            )
        )
    return feats


def is_max_context(spans: list[tuple[int, int]], cur: int, position: int) -> bool:
    """_check_is_max_context (mrc_utils.py:80-113): a context char's
    score in a span = min(left, right context) + 0.01·span_length; only
    the argmax span owns the char."""
    best, best_idx = None, None
    for idx, (s, ln) in enumerate(spans):
        e = s + ln - 1
        if position < s or position > e:
            continue
        score = min(position - s, e - position) + 0.01 * ln
        if best is None or score > best:
            best, best_idx = score, idx
    return cur == best_idx


def _log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    z = x - m
    return z - np.log(np.exp(z).sum(axis=axis, keepdims=True))


class _MRCFolded:
    """Per-type folded head tables (the MRC analog of model._FoldedTables).

    The head feature layout is [h2 | ctx] (HEAD_DIM), so a head dot
    product splits into ``h2 · w[:HIDDEN]`` plus ``ctx · w[HIDDEN:]``;
    the ctx half over the 7-slot window concat folds into per-char
    scalar tables ``Q_k[type][char] = emb[char] · w_slice_k`` — gathers
    instead of materializing the [B·T, IN_DIM] window concat.  Row V
    (one past vocab) is the zero virtual char for edge padding.

    ALL tables (including the MRC-private first-layer tables ``g64``)
    are built AND kept in float64: float32 BLAS kernels differ between
    processes (thread count, load-time dispatch), so float32 tables
    built on the pytest driver vs. a Spark worker diverge at ~1e-7 —
    enough to flip a round-to-6 oracle value.  float64 noise is ~1e-16
    and never reaches the reported 6 decimals.  (The CRF path tolerates
    float32 table noise because its outputs are discrete Viterbi paths;
    MRC reports continuous log probs.)
    """

    def __init__(self, weights: dict[str, np.ndarray]):
        emb = weights["emb"].astype(np.float64)
        v = emb.shape[0]
        self.v = v
        k_slots = 2 * WINDOW + 1
        nt = weights["mrc_ws"].shape[0]
        self.qs = np.zeros((k_slots, nt, v + 1), dtype=np.float64)
        self.qe = np.zeros((k_slots, nt, v + 1), dtype=np.float64)
        self.qc = np.zeros((k_slots, nt, v + 1), dtype=np.float64)
        ws = weights["mrc_ws"].astype(np.float64)
        we = weights["mrc_we"].astype(np.float64)
        wc = weights["mrc_wc"].astype(np.float64)
        for k in range(k_slots):
            sl = slice(HIDDEN + k * EMB_DIM, HIDDEN + (k + 1) * EMB_DIM)
            self.qs[k, :, :v] = (emb @ ws[:, sl].T).T
            self.qe[k, :, :v] = (emb @ we[:, sl].T).T
            self.qc[k, :, :v] = (emb @ wc[:, sl].T).T


class _MRCBuffers:
    """Per-process scratch reused across calls (model._Buffers pattern:
    in this lazily-backed VM every fresh large allocation first-touch
    faults through the hypervisor — measured 24× slowdown for an
    out-of-place tanh in a freshly forked python worker)."""

    def __init__(self) -> None:
        self.n = 0

    def ensure(self, n: int) -> None:
        if n > self.n:
            self.n = n
            self.h1 = np.empty((n, HIDDEN), dtype=np.float64)
            self.h2 = np.empty((n, HIDDEN), dtype=np.float64)
            self.tmp = np.empty((n, HIDDEN), dtype=np.float64)


_MRC_BUFS = _MRCBuffers()


_MRC_FOLD_CACHE: dict[tuple, _MRCFolded] = {}


def _mrc_folded(weights: dict[str, np.ndarray]) -> _MRCFolded:
    # Content key (model.folded64's pattern), NOT id(): an id-keyed
    # cache without a retained reference can silently return stale
    # tables when the keyed array is freed (e.g. an evicted broadcast
    # block re-fetched) and a new one lands at a recycled id.  Samples
    # EVERY folded array (ws, we, wc, emb) — a key covering only some
    # of them is the stale-hit class all over again for dicts sharing
    # the covered arrays but differing in an uncovered head.
    ws, we, wc, emb = (
        weights["mrc_ws"],
        weights["mrc_we"],
        weights["mrc_wc"],
        weights["emb"],
    )
    key = (
        ws.shape + emb.shape,
        ws[0, :8].tobytes(),
        ws[-1, -8:].tobytes(),
        we[0, :8].tobytes(),
        we[-1, -8:].tobytes(),
        wc[0, :8].tobytes(),
        wc[-1, -8:].tobytes(),
        emb[0, :8].tobytes(),
        emb[-1, :8].tobytes(),
    )
    f = _MRC_FOLD_CACHE.get(key)
    if f is None:
        _MRC_FOLD_CACHE.clear()
        f = _MRCFolded(weights)
        _MRC_FOLD_CACHE[key] = f
    return f


def span_head_scores(
    input_ids: np.ndarray,
    type_ids: np.ndarray,
    doc_offsets: np.ndarray,
    input_lens: np.ndarray,
    weights: dict[str, np.ndarray],
    start_n_top: int = START_N_TOP,
    end_n_top: int = END_N_TOP,
    max_answer_length: int = MAX_ANSWER_LENGTH,
):
    """Batched start/end/cls heads over encoder states.

    input_ids [B, T]; type_ids [B]; → per row:
    (start_idx [K], start_lp [K], end_idx [K, E], end_lp [K, E], cls).
    Indices are positions in input_ids (caller rebases by doc_offset).
    End candidates are drawn per start from the window
    [start, start + max_answer_length) ∩ context — the surrogate of the
    reference's start-conditioned end head (squad v2).

    Per-type heads (mrc_ws: [N_TYPES, HEAD_DIM]) — the query's entity
    type selects the scoring vector, the surrogate of query-conditioned
    attention (an additive type feature cannot interact with h under a
    single linear head).  Inference runs on the folded-gather path: h1
    from the shared first-layer tables (model._FoldedTables.g), the
    ctx half of each head from _MRCFolded scalar tables — no
    [B·T, IN_DIM] window concat is ever built.
    """
    b, t = input_ids.shape
    mf = _mrc_folded(weights)
    f64 = folded64(weights)
    k_slots = 2 * WINDOW + 1

    ids_pad = np.full((b, t + 2 * WINDOW), mf.v, dtype=np.int64)
    ids_pad[:, WINDOW : WINDOW + t] = input_ids
    # batch-size invariance: every position past a row's real length is
    # the virtual zero char — otherwise PAD id 0 (a real embedding row)
    # leaks into the last ≤WINDOW real positions' windows whenever the
    # chunk's t_max exceeds this row's length, making logits depend on
    # which rows share the chunk
    col = np.arange(t + 2 * WINDOW)[None, :]
    ids_pad[col >= (input_lens + WINDOW)[:, None]] = mf.v

    # Shared-passage encoding (r06): the 8 per-type examples of one
    # (page, span) differ ONLY in the [CLS] query [SEP] prefix, and the
    # encoder is window-local with no positional input — so a passage
    # position's state depends on the span chars alone once it is
    # ≥ WINDOW chars past the prefix.  Rows are grouped by identical
    # span content; the group representative (min doc_offset) encodes
    # fully, the others encode just their [0, doc_offset+WINDOW)
    # prefix and COPY the representative's aligned tail.  Every copied
    # value is produced by the same per-row gather→add→tanh→GEMM-row
    # sequence it would have been computed by (per-row GEMM results do
    # not depend on which other rows share the batch), so outputs are
    # unchanged — pytest-asserted against the unshared path, and the
    # golden-parquet oracles gate it end-to-end.  Encoder cost drops
    # ~N_TYPES× (measured 47s → ~8s single-threaded at sf0.1).
    groups: dict[bytes, list[int]] = {}
    for i in range(b):
        key = ids_pad[
            i, WINDOW + doc_offsets[i] : WINDOW + input_lens[i]
        ].tobytes()
        groups.setdefault(key, []).append(i)
    sel_parts: list[np.ndarray] = []
    copies: list[tuple[int, int, int, int, int]] = []
    for rows in groups.values():
        r0 = min(rows, key=lambda i: (doc_offsets[i], i))
        # prefix bound clamped to t (a sub-WINDOW span can put
        # doc_offset+WINDOW past the trimmed width)
        p30 = min(int(doc_offsets[r0]) + WINDOW, t)
        sel_parts.append(np.arange(r0 * t, r0 * t + t, dtype=np.int64))
        for i in rows:
            if i == r0:
                continue
            p3 = min(int(doc_offsets[i]) + WINDOW, t)
            sel_parts.append(np.arange(i * t, i * t + p3, dtype=np.int64))
            if t > p3:
                copies.append((i, p3, r0, p30, t - p3))
    sel = np.concatenate(sel_parts)
    n_sel = sel.shape[0]

    # encoder in float64 throughout (see _MRCFolded on why): h1 via
    # first-layer gathers over the SELECTED positions, h2 via one
    # small GEMM — all into reused scratch (in-place tanh, matmul out=)
    _MRC_BUFS.ensure(b * t)
    h1 = _MRC_BUFS.h1[:n_sel]
    tmp = _MRC_BUFS.tmp[:n_sel]
    np.take(
        f64.g64[0], ids_pad[:, 0:t].reshape(-1)[sel], axis=0, out=h1
    )
    for k in range(1, k_slots):
        np.take(
            f64.g64[k], ids_pad[:, k : k + t].reshape(-1)[sel], axis=0, out=tmp
        )
        h1 += tmp
    h1 += f64.b1
    np.tanh(h1, out=h1)
    h2_sel = _MRC_BUFS.tmp[:n_sel]
    np.matmul(h1, f64.w2, out=h2_sel)
    h2_sel += f64.b2
    np.tanh(h2_sel, out=h2_sel)
    h2 = _MRC_BUFS.h2[: b * t]
    h2[sel] = h2_sel
    h2 = h2.reshape(b, t, HIDDEN)
    for dst, dst_p, src, src_p, ln in copies:
        h2[dst, dst_p : dst_p + ln] = h2[src, src_p : src_p + ln]

    # head logits: h2 half (einsum) + ctx half (per-type scalar gathers,
    # accumulated into the reused scalar scratch — no [B, T] temp per slot)
    ws1 = weights["mrc_ws"][type_ids, :HIDDEN].astype(np.float64)
    we1 = weights["mrc_we"][type_ids, :HIDDEN].astype(np.float64)
    start_logits = np.einsum("btd,bd->bt", h2, ws1) + weights["mrc_bs"][type_ids][:, None]
    end_logits = np.einsum("btd,bd->bt", h2, we1) + weights["mrc_be"][type_ids][:, None]
    stmp = tmp.ravel()[: b * t].reshape(b, t)  # contiguous scalar scratch
    for k in range(k_slots):
        chars = ids_pad[:, k : k + t]
        np.take(mf.qs[k], (type_ids[:, None] * (mf.v + 1)) + chars, out=stmp)
        start_logits += stmp
        np.take(mf.qe[k], (type_ids[:, None] * (mf.v + 1)) + chars, out=stmp)
        end_logits += stmp

    # Quantize to 9 decimals BEFORE ranking: positions with identical
    # windows (repeated-char text) have identical true logits, but
    # batch-shape BLAS noise (~1e-15) would otherwise decide their
    # top-k order differently in differently-batched runs — an exact
    # tie broken by position is deterministic everywhere.
    np.round(start_logits, 9, out=start_logits)
    np.round(end_logits, 9, out=end_logits)

    # context-position mask: valid positions are [doc_offset, input_len-1)
    # (in-place masked assignment — np.where would allocate a copy)
    pos = np.arange(t)[None, :]
    ctx_mask = (pos >= doc_offsets[:, None]) & (pos < (input_lens - 1)[:, None])
    neg = np.float64(-1e30)
    start_logits[~ctx_mask] = neg
    end_logits[~ctx_mask] = neg

    start_lp_all = _log_softmax(start_logits)
    k_top = start_n_top
    # deterministic top-k: stable sort on negated logits → ties break
    # toward the smaller position
    start_idx = np.argsort(-start_logits, axis=1, kind="stable")[:, :k_top]
    start_lp = np.take_along_axis(start_lp_all, start_idx, axis=1)

    # per-start end window: gather the ≤max_answer_length window instead
    # of re-masking the full axis (softmax over the window equals the
    # masked-full-axis softmax)
    e_top = end_n_top
    end_idx = np.zeros((b, k_top, e_top), dtype=np.int64)
    end_lp = np.zeros((b, k_top, e_top), dtype=np.float64)
    offs = np.arange(max_answer_length)[None, :]
    for i in range(k_top):
        si = start_idx[:, i]  # [B]
        widx = np.minimum(si[:, None] + offs, t - 1)  # [B, W]
        wvals = np.take_along_axis(end_logits, widx, axis=1)
        valid = (si[:, None] + offs < t) & np.take_along_axis(ctx_mask, widx, axis=1)
        wvals = np.where(valid, wvals, neg)
        wlp = _log_softmax(wvals)
        worder = np.argsort(-wvals, axis=1, kind="stable")[:, :e_top]
        end_idx[:, i, :] = np.take_along_axis(widx, worder, axis=1)
        end_lp[:, i, :] = np.take_along_axis(wlp, worder, axis=1)

    # cls head over mean-pooled real positions, per-type like start/end
    # (einsum contraction — no [B, T, HIDDEN] masked temporary)
    real_mask = (pos < input_lens[:, None]).astype(np.float64)
    denom = real_mask.sum(axis=1)
    pooled_h2 = np.einsum("btd,bt->bd", h2, real_mask) / denom[:, None]
    wc1 = weights["mrc_wc"][type_ids, :HIDDEN].astype(np.float64)
    # h1's scratch is free after the h2 GEMM — reuse it for the cls ctx sum
    cls_ctx = _MRC_BUFS.h1.ravel()[: b * t].reshape(b, t)
    np.take(mf.qc[0], (type_ids[:, None] * (mf.v + 1)) + ids_pad[:, 0:t], out=cls_ctx)
    for k in range(1, k_slots):
        np.take(mf.qc[k], (type_ids[:, None] * (mf.v + 1)) + ids_pad[:, k : k + t], out=stmp)
        cls_ctx += stmp
    cls = np.round(
        (pooled_h2 * wc1).sum(-1)
        + (cls_ctx * real_mask).sum(axis=1) / denom
        + weights["mrc_bc"][type_ids],
        9,
    )
    return start_idx, start_lp, end_idx, end_lp, cls


def batch_candidates(
    examples: list[tuple[str, str]],
    weights: dict[str, np.ndarray],
    vocab: dict[str, int] | None = None,
    # 32×384 keeps the f64 working set ≈125 MB/worker: first touch of
    # these pages faults through the hypervisor (one-time per worker),
    # and 32 concurrent workers contend on the fault path — smaller is
    # cheaper to warm with no measurable warm-throughput loss
    sub_batch: int = 32,
):
    """[(question_type, context)] → per-example (rows, feat_cls).

    Features of ALL examples are stacked and encoded in ``sub_batch``
    chunks — one big GEMM instead of per-example [1, 384] calls (the
    same micro-batching the CRF detect stage uses).  Candidate row:
    (span_index, start_orig, end_orig, start_lp, end_lp), orig = char
    offsets in the example's context (end inclusive), after the
    accumulate_predictions_v2 validity filters.  ``feat_cls`` =
    [(span_index, cls_logit)] per feature.
    """
    if vocab is None:
        vocab = build_vocab()
    feats: list[tuple[int, MRCFeature]] = []  # (example index, feature)
    for xi, (typ, ctx) in enumerate(examples):
        for f in featurize_example(QUESTIONS[typ], ctx, vocab=vocab):
            feats.append((xi, f))
    # length-sorted chunks → each chunk trims to its own max real length
    # (ties broken by arrival order for determinism); the pad tail of a
    # 384-wide batch is pure wasted memory bandwidth
    # cluster same-span features adjacently (span length desc, then the
    # example context + span window) so span_head_scores' shared-
    # passage grouping finds a span's per-type variants inside ONE
    # sub-batch; span lengths within a chunk stay near-uniform, so the
    # t_max trim is as tight as the former pure length sort.  Key is
    # deterministic (no salted hash()) — values are batching-invariant
    # anyway (pinned by test_span_head_scores_shared_encode_exact).
    feats.sort(
        key=lambda xf: (
            -(xf[1].input_len - xf[1].doc_offset),
            examples[xf[0]][1],
            xf[1].span_start,
            -xf[1].input_len,
        )
    )

    results: list[tuple[list, list]] = [([], []) for _ in examples]
    for lo in range(0, len(feats), sub_batch):
        chunk = feats[lo : lo + sub_batch]
        t_max = max(f.input_len for _, f in chunk)
        ids = np.asarray([f.input_ids[:t_max] for _, f in chunk], dtype=np.int64)
        t_ids = np.asarray(
            [TYPE_INDEX[examples[xi][0]] for xi, _ in chunk], dtype=np.int64
        )
        offs = np.asarray([f.doc_offset for _, f in chunk], dtype=np.int64)
        lens = np.asarray([f.input_len for _, f in chunk], dtype=np.int64)
        s_idx, s_lp, e_idx, e_lp, cls = span_head_scores(
            ids, t_ids, offs, lens, weights
        )
        for fi, (xi, f) in enumerate(chunk):
            rows, feat_cls = results[xi]
            feat_cls.append((f.span_index, float(cls[fi])))
            for i in range(s_idx.shape[1]):
                for j in range(e_idx.shape[2]):
                    si = int(s_idx[fi, i]) - f.doc_offset
                    ei = int(e_idx[fi, i, j]) - f.doc_offset
                    if si < 0 or ei >= f.span_length or ei < si:
                        continue
                    if ei - si + 1 > MAX_ANSWER_LENGTH:
                        continue
                    rows.append(
                        (
                            f.span_index,
                            f.span_start + si,
                            f.span_start + ei,
                            float(s_lp[fi, i]),
                            float(e_lp[fi, i, j]),
                        )
                    )
    return results


def candidates_for_example(
    question_type: str,
    context: str,
    weights: dict[str, np.ndarray],
    vocab: dict[str, int] | None = None,
    per_feature_cls: bool = False,
):
    """Single-example convenience over ``batch_candidates``.

    ``cls`` is the mean cls logit across features, or per-feature
    ``[(span_index, cls)]`` when ``per_feature_cls``.
    """
    rows, feat_cls = batch_candidates([(question_type, context)], weights, vocab)[0]
    if per_feature_cls:
        return rows, feat_cls
    return rows, float(np.mean([c for _, c in feat_cls]))


def assemble_nbest(
    rows: list[tuple], context: str, n_best_size: int = N_BEST_SIZE
) -> list[dict]:
    """get_predictions_v2 core (mrc_utils.py:368-447): average logprobs
    per (span, start, end), sort by total, map to text, dedup
    keep-first, cap n_best, softmax."""
    by_pos: dict[tuple, list[tuple]] = {}
    for span_idx, s, e, slp, elp in rows:
        by_pos.setdefault((span_idx, s, e), []).append((slp, elp))
    prelim = []
    for (span_idx, s, e), lps in by_pos.items():
        slp = sum(x[0] for x in lps) / len(lps)
        elp = sum(x[1] for x in lps) / len(lps)
        prelim.append((slp + elp, s, e, slp, elp, span_idx))
    # deterministic order: total desc, then position asc
    prelim.sort(key=lambda x: (-x[0], x[1], x[2], x[5]))

    seen = set()
    nbest = []
    for total, s, e, slp, elp, _si in prelim:
        if len(nbest) >= n_best_size:
            break
        text = context[s : e + 1].strip()
        if text in seen:
            continue
        seen.add(text)
        nbest.append({"text": text, "start": s, "end": e, "start_lp": slp, "end_lp": elp})
    if not nbest:
        nbest.append({"text": "", "start": -1, "end": -1, "start_lp": -1e6, "end_lp": -1e6})

    totals = np.asarray([x["start_lp"] + x["end_lp"] for x in nbest])
    m = totals.max()
    probs = np.exp(totals - m)
    probs /= probs.sum()
    for i, x in enumerate(nbest):
        x["probability"] = float(probs[i])
    return nbest
