"""M6: NRE entity-marked encoding (albert_encoder.py:49-119 semantics).

Given a sentence and head/tail char spans, produce the relation-
classifier input: order-normalize the spans (``rev`` flag when head
starts after tail, albert_encoder.py:66-73), tokenize the five segments
(char-level here, like our featurizer), wrap the first-occurring entity
in ``[unused0]/[unused1]`` and the second in ``[unused2]/[unused3]``
(swapped when ``rev`` — albert_encoder.py:92-93), assemble
``[CLS] s0 e0 s1 e1 s2 [SEP]``, record the head/tail marker positions
(clamped to max_length-1), zero-pad, and build the attention mask over
the unpadded prefix (albert_encoder.py:95-117).

The reference runs this per item inside a row-at-a-time loop
(models.py:10-18); the Spark operator applies it batch-wise inside a
pandas UDF. [NORTH] replaces the relation *model* with rules (see
operators/triples.py), but the pairing/encoding semantics carry over
for downstream model-based RE.
"""

from __future__ import annotations

from .vocab import CLS_ID, SEP_ID, UNK_ID, build_vocab

# marker ids mirror the reference's [unused0..3] slots; our surrogate
# vocab's reserved region starts at [unused3] (ids 0-2 are PAD + the
# curly quotes, matching the reference vocab's own layout), so the four
# marker slots are [unused3..6]
_MARKER_BASE = 3


def _marker_id(n: int, vocab: dict[str, int]) -> int:
    return vocab[f"[unused{_MARKER_BASE + n}]"]


def encode_pair(
    text: str,
    head: tuple[int, int],
    tail: tuple[int, int],
    max_length: int = 128,
    vocab: dict[str, int] | None = None,
) -> tuple[list[int], list[int], int, int]:
    """→ (token_ids[max_length], att_mask[max_length], pos_head, pos_tail)."""
    if vocab is None:
        vocab = build_vocab()

    if head[0] > tail[0]:
        pos_min, pos_max, rev = tail, head, True
    else:
        pos_min, pos_max, rev = head, tail, False

    def toks(s: str) -> list[int]:
        return [vocab.get(ch, UNK_ID) for ch in s]

    sent0 = toks(text[: pos_min[0]])
    ent0 = toks(text[pos_min[0] : pos_min[1]])
    sent1 = toks(text[pos_min[1] : pos_max[0]])
    ent1 = toks(text[pos_max[0] : pos_max[1]])
    sent2 = toks(text[pos_max[1] :])

    m = [_marker_id(i, vocab) for i in range(4)]
    if not rev:
        ent0 = [m[0], *ent0, m[1]]
        ent1 = [m[2], *ent1, m[3]]
    else:
        ent0 = [m[2], *ent0, m[3]]
        ent1 = [m[0], *ent1, m[1]]

    ids = [CLS_ID, *sent0, *ent0, *sent1, *ent1, *sent2, SEP_ID]
    if not rev:
        pos_head = 1 + len(sent0)
        pos_tail = 1 + len(sent0) + len(ent0) + len(sent1)
    else:
        pos_head = 1 + len(sent0) + len(ent0) + len(sent1)
        pos_tail = 1 + len(sent0)
    pos_head = min(max_length - 1, pos_head)
    pos_tail = min(max_length - 1, pos_tail)

    avai_len = len(ids)
    if len(ids) < max_length:
        ids = ids + [0] * (max_length - len(ids))
    ids = ids[:max_length]
    att_mask = [1 if i < avai_len else 0 for i in range(max_length)]
    return ids, att_mask, pos_head, pos_tail


# --------------------------------------------------------------------------
# M7: model-based relation classification over the M6 encodings
# --------------------------------------------------------------------------


def record_pair_features(
    text: str,
    pairs: list[tuple[int, int, int, int]],
    weights,
    vocab: dict[str, int] | None = None,
):
    """One record's candidate pairs → [P, MARKER_DIM+POOL_DIM] float64.

    The SoftmaxNN surrogate's sentence encoding (models.py:31-41 scores
    relations from AlbertEntityEncoder states), restructured for the
    shape that survives at scale: a record's ~150 candidate pairs share
    one encode of the record text, instead of each pair re-encoding its
    own marked copy (the per-pair formulation was the memory-bandwidth
    wall at 32 workers — overlapping between-segments re-encoded ~150×).

    Per pair (h_start, h_end, t_start, t_end):
    - marker features: h2 + window concat ([h2 | ctx], the layout every
      head here uses) at the two opening-marker positions of the M6
      marked sequence (encode_pair) — only those TWO positions are
      encoded per pair,
    - pooled features: mean + max of the SHARED record h2 over the
      between-text positions [h_end, t_start) — max is the connective
      presence detector, mean the context summary; empty → zeros.

    All float64 on model.folded64 tables: bit-stable across processes;
    batch-shape noise is BLAS-kernel level (~1e-15), below the 1e-6
    reporting precision.
    """
    import numpy as np

    from .model import HIDDEN, WINDOW, folded64

    if vocab is None:
        vocab = build_vocab()
    f = folded64(weights)
    k_slots = 2 * WINDOW + 1
    p_n = len(pairs)

    # ---- record encode, once ----
    rec_ids = np.asarray([vocab.get(ch, UNK_ID) for ch in text], dtype=np.int64)
    L = len(rec_ids)
    rec_pad = np.full(L + 2 * WINDOW, f.v, dtype=np.int64)
    rec_pad[WINDOW : WINDOW + L] = rec_ids
    _NRE_BUFS.ensure(L + 2 * p_n)
    h1 = _NRE_BUFS.h1[:L]
    tmp = _NRE_BUFS.tmp[:L]
    if L:
        np.take(f.g64[0], rec_pad[0:L], axis=0, out=h1)
        for k in range(1, k_slots):
            np.take(f.g64[k], rec_pad[k : k + L], axis=0, out=tmp)
            h1 += tmp
        h1 += f.b1
        np.tanh(h1, out=h1)
    h2_rec = _NRE_BUFS.h2[:L]
    if L:
        np.matmul(h1, f.w2, out=h2_rec)
        h2_rec += f.b2
        np.tanh(h2_rec, out=h2_rec)

    # ---- per-pair marker windows (2 positions each) ----
    # encode_pair semantics inlined over the ALREADY-tokenized record
    # (r06): the per-pair call re-tokenized all five text segments
    # through a python dict per char — 61% of the kernel (measured,
    # cProfile); here the marked sequence is slice-copies of rec_ids
    # into a reused buffer plus four marker writes.  Identical ids,
    # marker positions, truncation and window padding — pytest-asserted
    # against an encode_pair-based reference
    # (tests/test_nre_relations.py::test_record_pair_marker_windows_match_encode_pair).
    win_ids = np.full((2 * p_n, k_slots), f.v, dtype=np.int64)
    max_length = 128
    m_ids = [_marker_id(j, vocab) for j in range(4)]
    seq_len = L + 6  # [CLS] + chars + 4 markers + [SEP]
    avai = min(seq_len, max_length)
    buf = np.empty(seq_len, dtype=np.int64)
    pbuf = np.full(avai + 2 * WINDOW, f.v, dtype=np.int64)
    for i, (hs, he, ts, te) in enumerate(pairs):
        if hs > ts:
            (a0, a1), (b0, b1), rev = (ts, te), (hs, he), True
        else:
            (a0, a1), (b0, b1), rev = (hs, he), (ts, te), False
        if rev:
            o0, c0, o1, c1 = m_ids[2], m_ids[3], m_ids[0], m_ids[1]
        else:
            o0, c0, o1, c1 = m_ids[0], m_ids[1], m_ids[2], m_ids[3]
        buf[0] = CLS_ID
        buf[1 : 1 + a0] = rec_ids[:a0]
        p = 1 + a0
        buf[p] = o0
        buf[p + 1 : p + 1 + (a1 - a0)] = rec_ids[a0:a1]
        q = p + 1 + (a1 - a0)
        buf[q] = c0
        buf[q + 1 : q + 1 + (b0 - a1)] = rec_ids[a1:b0]
        r = q + 1 + (b0 - a1)
        buf[r] = o1
        buf[r + 1 : r + 1 + (b1 - b0)] = rec_ids[b0:b1]
        s = r + 1 + (b1 - b0)
        buf[s] = c1
        buf[s + 1 : s + 1 + (L - b1)] = rec_ids[b1:]
        buf[seq_len - 1] = SEP_ID
        ph, pt = (r, p) if rev else (p, r)
        ph = min(max_length - 1, ph)
        pt = min(max_length - 1, pt)
        pbuf[WINDOW : WINDOW + avai] = buf[:avai]
        win_ids[2 * i] = pbuf[ph : ph + k_slots]
        win_ids[2 * i + 1] = pbuf[pt : pt + k_slots]

    # NOTE (r06, measured negative result): deduplicating the marker
    # windows before the GEMM (np.unique + gather-back) is NOT
    # value-safe here — at this per-record m (~100-300 rows) OpenBLAS
    # dgemm takes small-matrix kernels whose per-row results vary with
    # m by ~1e-15, enough to flip the 1e-9-grid quantization
    # occasionally (the MRC shared-passage encode is safe because its
    # GEMMs stay in the large-m blocked regime, where the pinned
    # exactness test holds).  The windows are computed per row.
    h1_m = np.zeros((2 * p_n, HIDDEN), dtype=np.float64)
    for k in range(k_slots):
        h1_m += f.g64[k][win_ids[:, k]]
    h1_m += f.b1
    np.tanh(h1_m, out=h1_m)
    h2_m = np.tanh(h1_m @ f.w2 + f.b2)
    ctx_m = np.concatenate(
        [f.emb64[win_ids[:, k]] for k in range(k_slots)], axis=1
    )  # [2P, IN_DIM]
    marker = np.concatenate([h2_m, ctx_m], axis=1)  # [2P, HEAD_DIM]

    # ---- pooled span features from the shared record encode ----
    # window [h_start, t_end): both entities + the between-text.  The
    # connective chars live in the between-text; entity chars draw from
    # disjoint per-type pools, so including them adds context without
    # aliasing the connective detectors.  Identical (hs, te) ranges
    # share one mean/max computation (same slice → same values).
    mid_mean = np.zeros((p_n, HIDDEN), dtype=np.float64)
    mid_max = np.zeros((p_n, HIDDEN), dtype=np.float64)
    seen_rng: dict[tuple[int, int], int] = {}
    for i, (hs, he, ts, te) in enumerate(pairs):
        if te > hs:
            j = seen_rng.get((hs, te))
            if j is None:
                seg = h2_rec[hs:te]
                mid_mean[i] = seg.mean(axis=0)
                mid_max[i] = seg.max(axis=0)
                seen_rng[(hs, te)] = i
            else:
                mid_mean[i] = mid_mean[j]
                mid_max[i] = mid_max[j]

    return np.concatenate(
        [marker[0::2], marker[1::2], mid_mean, mid_max], axis=1
    )


# pair_features layout (see above): marker blocks then pooled blocks
MARKER_DIM = 2 * (256 + 672)  # 2 × HEAD_DIM
POOL_DIM = 2 * 256            # mean + max h2 over the between-segment


class _NREBufs:
    """Reused per-process scratch (model._Buffers pattern — fresh large
    allocations page-fault through the hypervisor in this VM)."""

    def __init__(self) -> None:
        self.n = 0

    def ensure(self, n: int) -> None:
        if n > self.n:
            self.n = n
            import numpy as np

            from .model import HIDDEN

            self.h1 = np.empty((n, HIDDEN), dtype=np.float64)
            self.h2 = np.empty((n, HIDDEN), dtype=np.float64)
            self.tmp = np.empty((n, HIDDEN), dtype=np.float64)


_NRE_BUFS = _NREBufs()


from functools import lru_cache


@lru_cache(maxsize=1)
def _classify_tables():
    """Constant lookup tables for the hierarchical head (built once per
    process — classify_pairs runs inside the per-record UDF loop)."""
    from ..core.artifacts import nre_relation_labels
    from ..sources.pages import doc_rules

    import numpy as np

    from ..core.labels import ENTITY_TYPES

    conn_patterns = sorted({r.pattern for r in doc_rules()})
    conn_idx = {p: i for i, p in enumerate(conn_patterns)}
    rule_by_pair = {(r.subj_label, r.obj_label): r for r in doc_rules()}
    lab_idx = {p: i for i, p in enumerate(nre_relation_labels())}
    # dense (t1, t2) → connective / predicate matrices for the
    # vectorized classify_pairs (r06)
    pair_conn = np.array(
        [
            [conn_idx[rule_by_pair[(a, c)].pattern] for c in ENTITY_TYPES]
            for a in ENTITY_TYPES
        ],
        dtype=np.int64,
    )
    pair_pred = np.array(
        [
            [lab_idx[rule_by_pair[(a, c)].predicate] for c in ENTITY_TYPES]
            for a in ENTITY_TYPES
        ],
        dtype=np.int64,
    )
    return conn_idx, rule_by_pair, lab_idx, pair_conn, pair_pred


def classify_pairs(feats, weights):
    """[B, D] features → (pred_idx [B], prob [B]).

    Hierarchical head (the linear-surrogate decomposition of SoftmaxNN:
    a single linear layer cannot express "types match AND this pair's
    connective is present", the same interaction problem the MRC heads
    solve per-type):

    1. head/tail entity types from the marker features
       (``nre_type_w`` [HEAD_DIM+1, 8] ridge, argmax),
    2. the (t1, t2) pair selects its rule connective — the model's
       rel2id structure (models.py:33 loads rel2id the same way),
    3. that connective's binary presence detector over the pooled
       between-segment features (``nre_conn_w`` [POOL_DIM+1, 6]) gates
       predicate vs 'NA'; prob = logistic in the detector margin.

    pred_idx indexes artifacts.nre_relation_labels(); deterministic
    (argmax ties to the lower index, all math float64).
    """
    import numpy as np

    from .labels import ENTITY_TYPES
    from .model import HEAD_DIM

    conn_idx, rule_by_pair, lab_idx, pair_conn, pair_pred = _classify_tables()

    b = len(feats)
    ones = np.ones((b, 1))
    h_feat = np.concatenate([feats[:, :HEAD_DIM], ones], axis=1)
    t_feat = np.concatenate([feats[:, HEAD_DIM:MARKER_DIM], ones], axis=1)
    pool = np.concatenate([feats[:, MARKER_DIM : MARKER_DIM + POOL_DIM], ones], axis=1)

    # quantize to 9 decimals before argmax/thresholding: exact-tie
    # inputs must classify identically regardless of batch-shape BLAS
    # noise (~1e-15) — same hardening as the MRC logits
    t1 = np.round(h_feat @ weights["nre_type_w"], 9).argmax(axis=1)
    t2 = np.round(t_feat @ weights["nre_type_w"], 9).argmax(axis=1)
    conn_scores = np.round(pool @ weights["nre_conn_w"], 9)  # [B, 6]

    # vectorized over the batch (r06) — elementwise np.clip/np.exp and
    # the divisions are the same ufunc operations the former per-pair
    # scalar loop applied, so results are bit-identical.  Detector
    # targets are 0/10; the exponent clip keeps a strongly negative
    # margin from overflowing np.exp (bit-identical for |5 - s| < 60
    # and still rounding to 0/1 beyond).
    s = conn_scores[np.arange(b), pair_conn[t1, t2]]
    p_rel = 1.0 / (1.0 + np.exp(np.clip(5.0 - s, -60.0, 60.0)))
    rel = p_rel >= 0.5
    pred = np.where(rel, pair_pred[t1, t2], lab_idx["NA"])
    prob = np.where(rel, p_rel, 1.0 - p_rel)
    return pred, prob
