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


def pair_features(
    token_ids,
    lens,
    pos_head,
    pos_tail,
    weights,
):
    """[B, T] ids + marker positions → [B, 2·(HIDDEN+IN_DIM)+HIDDEN] f64.

    The SoftmaxNN surrogate's sentence encoding (models.py:31-41 scores
    relations from the AlbertEntityEncoder states): encoder states at
    the head and tail marker positions, each with its residual window
    concat (the [h2 | ctx] layout the CRF/MRC heads use), plus the MEAN
    h2 over the segment between the two opening markers — the stand-in
    for attention over the connective text, which a window-local
    encoder cannot reach from the marker positions alone.  All float64
    on the shared folded tables (model.folded64) so results are
    bit-stable across process and batch boundaries; positions past each
    row's real length are the virtual zero char.
    """
    import numpy as np

    from .model import EMB_DIM, HIDDEN, WINDOW, folded64

    f = folded64(weights)
    ids = np.asarray(token_ids, dtype=np.int64)
    b, t = ids.shape
    lens = np.asarray(lens, dtype=np.int64)
    ph = np.asarray(pos_head, dtype=np.int64)
    pt = np.asarray(pos_tail, dtype=np.int64)
    k_slots = 2 * WINDOW + 1

    ids_pad = np.full((b, t + 2 * WINDOW), f.v, dtype=np.int64)
    ids_pad[:, WINDOW : WINDOW + t] = ids
    col = np.arange(t + 2 * WINDOW)[None, :]
    ids_pad[col >= (lens + WINDOW)[:, None]] = f.v

    h1 = np.zeros((b * t, HIDDEN), dtype=np.float64)
    for k in range(k_slots):
        h1 += f.g64[k][ids_pad[:, k : k + t]].reshape(-1, HIDDEN)
    h1 += f.b1
    np.tanh(h1, out=h1)
    h2 = h1 @ f.w2
    h2 += f.b2
    np.tanh(h2, out=h2)
    h2 = h2.reshape(b, t, HIDDEN)

    rows = np.arange(b)

    def at(p):
        hp = h2[rows, p]  # [B, HIDDEN]
        ctx = np.concatenate(
            [f.emb64[ids_pad[rows, p + k]] for k in range(k_slots)], axis=1
        )  # [B, IN_DIM]
        return np.concatenate([hp, ctx], axis=1)

    # mean + max h2 over the inter-marker segment (exclusive).  The max
    # pool is the presence detector: a position sitting on the
    # connective fires regardless of segment length, where the mean
    # dilutes with distance.  Empty segment → zeros.
    lo = np.minimum(ph, pt)
    hi = np.maximum(ph, pt)
    pos = np.arange(t)[None, :]
    mid_mask = (pos > lo[:, None]) & (pos < hi[:, None])
    midf = mid_mask.astype(np.float64)
    cnt = np.maximum(midf.sum(axis=1), 1.0)
    mid_mean = np.einsum("btd,bt->bd", h2, midf) / cnt[:, None]
    neg = np.float64(-1e30)
    masked = np.where(mid_mask[:, :, None], h2, neg)
    mid_max = masked.max(axis=1)
    mid_max[mid_max <= neg / 2] = 0.0  # rows with empty segments

    return np.concatenate([at(ph), at(pt), mid_mean, mid_max], axis=1)


# pair_features layout (see above): marker blocks then pooled blocks
MARKER_DIM = 2 * (256 + 672)  # 2 × HEAD_DIM
POOL_DIM = 2 * 256            # mean + max h2 over the between-segment


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

    from ..sources.pages import doc_rules
    from .labels import ENTITY_TYPES
    from .model import HEAD_DIM

    conn_patterns = sorted({r.pattern for r in doc_rules()})
    conn_idx = {p: i for i, p in enumerate(conn_patterns)}
    rule_by_pair = {(r.subj_label, r.obj_label): r for r in doc_rules()}
    from ..core.artifacts import nre_relation_labels

    labels = nre_relation_labels()
    lab_idx = {p: i for i, p in enumerate(labels)}

    b = len(feats)
    ones = np.ones((b, 1))
    h_feat = np.concatenate([feats[:, :HEAD_DIM], ones], axis=1)
    t_feat = np.concatenate([feats[:, HEAD_DIM:MARKER_DIM], ones], axis=1)
    pool = np.concatenate([feats[:, MARKER_DIM : MARKER_DIM + POOL_DIM], ones], axis=1)

    t1 = (h_feat @ weights["nre_type_w"]).argmax(axis=1)
    t2 = (t_feat @ weights["nre_type_w"]).argmax(axis=1)
    conn_scores = pool @ weights["nre_conn_w"]  # [B, 6]

    pred = np.zeros(b, dtype=np.int64)
    prob = np.zeros(b, dtype=np.float64)
    for i in range(b):
        a, c = ENTITY_TYPES[t1[i]], ENTITY_TYPES[t2[i]]
        rule = rule_by_pair[(a, c)]
        s = conn_scores[i, conn_idx[rule.pattern]]
        p_rel = 1.0 / (1.0 + np.exp(5.0 - s))  # detector targets are 0/10
        if p_rel >= 0.5:
            pred[i] = lab_idx[rule.predicate]
            prob[i] = p_rel
        else:
            pred[i] = lab_idx["NA"]
            prob[i] = 1.0 - p_rel
    return pred, prob
