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
