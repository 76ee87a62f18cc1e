"""Char-level featurization — the per-row invariant (F11).

Reimplements the semantics of ``convert_single_example``
(``knowledgeextractor/utils/crf_utils.py:72-220``, char loop 150-163,
truncation 166-169, CLS/SEP insertion 171-178, padding 185-198):

per char of ``text``: label = ``token_labels[i]`` (``O`` when absent),
char OOV → ``[UNK]``; truncate tokens/segments/labels to
``max_seq_length - 2``; insert ``[CLS]`` (label ``O``) and append
``[SEP]`` (label ``O``); ids via vocab; mask = 1 for real tokens;
zero-pad ids/mask/segments to ``max_seq_length``, pad labels with the
``O`` id; assert all four vectors have length ``max_seq_length``.

Iteration is Python ``str`` iteration per code point — SURVEY.md §7
flags that pandas ``.str`` ops differ on astral-plane chars, so the
Spark featurizer loops this same function over the Arrow batch.
"""

from __future__ import annotations

from .labels import LABEL_MAP, O_ID
from .vocab import CLS_ID, SEP_ID, UNK_ID, build_vocab

MAX_SEQ_LENGTH = 384  # config/crf_processor.json:3


def convert_single_example(
    text: str,
    token_labels: list[str] | None = None,
    max_seq_length: int = MAX_SEQ_LENGTH,
    vocab: dict[str, int] | None = None,
) -> tuple[list[int], list[int], list[int], list[int]]:
    """→ (input_ids, input_mask, segment_ids, label_ids), each len == max_seq_length."""
    if vocab is None:
        vocab = build_vocab()

    input_ids: list[int] = []
    label_ids: list[int] = []
    for offset, ch in enumerate(text):
        if token_labels is None:
            label = O_ID
        else:
            label = LABEL_MAP[token_labels[offset]]
        input_ids.append(vocab.get(ch, UNK_ID))
        label_ids.append(label)

    # Account for [CLS] and [SEP] with "- 2" (crf_utils.py:166-169)
    if len(input_ids) > max_seq_length - 2:
        input_ids = input_ids[: max_seq_length - 2]
        label_ids = label_ids[: max_seq_length - 2]

    input_ids = [CLS_ID] + input_ids + [SEP_ID]
    label_ids = [O_ID] + label_ids + [O_ID]

    n = len(input_ids)
    input_mask = [1] * n
    segment_ids = [0] * n

    pad = max_seq_length - n
    if pad > 0:
        input_ids += [0] * pad
        input_mask += [0] * pad
        segment_ids += [0] * pad
        label_ids += [O_ID] * pad

    assert len(input_ids) == max_seq_length
    assert len(input_mask) == max_seq_length
    assert len(segment_ids) == max_seq_length
    assert len(label_ids) == max_seq_length
    return input_ids, input_mask, segment_ids, label_ids


def recover_tags(tag_ids: list[int], input_ids: list[int], inv_label_map: dict[int, str]) -> list[str]:
    """Cut decoded tags back to the text span (crf_processor.py:86-103).

    Drops the ``[CLS]`` position and everything from the first ``[SEP]``
    on; returns per-char label strings aligned to the (truncated) text.
    """
    idx = 0
    n = len(input_ids)
    while idx < n and input_ids[idx] != SEP_ID:
        idx += 1
    return [inv_label_map[t] for t in tag_ids[1:idx]]
