"""F11 featurizer invariants (crf_utils.py:72-220 semantics)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgeextraction_spark.core.featurize import (
    MAX_SEQ_LENGTH,
    convert_single_example,
    recover_tags,
)
from knowledgeextraction_spark.core.labels import INV_LABEL_MAP, LABEL_MAP, LABELS, O_ID
from knowledgeextraction_spark.core.vocab import CLS_ID, SEP_ID, UNK_ID, build_vocab


def test_empty_text():
    ids, mask, seg, lab = convert_single_example("")
    assert ids[0] == CLS_ID and ids[1] == SEP_ID
    assert sum(mask) == 2
    assert len(ids) == len(mask) == len(seg) == len(lab) == MAX_SEQ_LENGTH


def test_basic_shape_and_specials():
    vocab = build_vocab()
    text = "你好"
    ids, mask, seg, lab = convert_single_example(text)
    assert ids[0] == CLS_ID
    assert ids[1] == vocab["你"]
    assert ids[2] == vocab["好"]
    assert ids[3] == SEP_ID
    assert ids[4] == 0  # pad
    assert mask[:4] == [1, 1, 1, 1] and mask[4] == 0
    assert all(s == 0 for s in seg)
    assert lab == [O_ID] * MAX_SEQ_LENGTH


def test_oov_maps_to_unk():
    # ₳ is not in the surrogate vocab
    ids, *_ = convert_single_example("₳")
    assert ids[1] == UNK_ID


def test_labels_follow_chars_and_pad_with_O():
    text = "甲乙丙"
    tags = ["disease-B", "disease-I", "O"]
    ids, mask, seg, lab = convert_single_example(text, tags)
    assert lab[0] == O_ID  # CLS gets O (crf_utils.py:174)
    assert lab[1] == LABEL_MAP["disease-B"]
    assert lab[2] == LABEL_MAP["disease-I"]
    assert lab[3] == O_ID
    assert lab[4] == O_ID  # SEP gets O
    assert lab[5:] == [O_ID] * (MAX_SEQ_LENGTH - 5)


def test_truncation_at_max_minus_two():
    text = "好" * 500
    tags = ["O"] * 500
    ids, mask, seg, lab = convert_single_example(text, tags)
    assert len(ids) == MAX_SEQ_LENGTH
    assert sum(mask) == MAX_SEQ_LENGTH  # fully real: 382 chars + CLS + SEP
    assert ids[-1] == SEP_ID  # SEP appended after truncation


def test_truncation_exact_boundary():
    # 382 chars exactly fill max_seq_length with CLS+SEP
    ids, mask, *_ = convert_single_example("好" * (MAX_SEQ_LENGTH - 2))
    assert sum(mask) == MAX_SEQ_LENGTH
    ids2, mask2, *_ = convert_single_example("好" * (MAX_SEQ_LENGTH - 1))
    assert ids == ids2  # 383rd char truncated away


@given(st.text(alphabet="你好甲乙丙xyz₳ ，。", max_size=500))
@settings(max_examples=200, deadline=None)
def test_lengths_always_max_seq(text):
    ids, mask, seg, lab = convert_single_example(text)
    assert len(ids) == len(mask) == len(seg) == len(lab) == MAX_SEQ_LENGTH
    n = min(len(text), MAX_SEQ_LENGTH - 2) + 2
    assert sum(mask) == n
    # mask is a prefix of ones
    assert all(m == 1 for m in mask[:n]) and all(m == 0 for m in mask[n:])


def test_recover_tags_cuts_cls_and_sep():
    text = "甲乙"
    tags = ["disease-B", "disease-I"]
    ids, mask, seg, lab = convert_single_example(text, tags)
    out = recover_tags(lab, ids, INV_LABEL_MAP)
    assert out == tags


@given(st.text(alphabet="你好甲乙丙，。", min_size=0, max_size=400))
@settings(max_examples=100, deadline=None)
def test_recover_roundtrip(text):
    tags = [LABELS[i % len(LABELS)] for i in range(len(text))]
    ids, mask, seg, lab = convert_single_example(text, tags)
    out = recover_tags(lab, ids, INV_LABEL_MAP)
    want = tags[: MAX_SEQ_LENGTH - 2]
    assert out == want
