"""W3 greedy packing + F5 BIO tagging invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgeextraction_spark.core.bio import bio_tag, tags_to_mentions
from knowledgeextraction_spark.core.packing import pack_sentences
from knowledgeextraction_spark.core.textops import to_sentences


def test_pack_single_short_text():
    text = "甲甲。乙乙！"
    recs = pack_sentences(text, [], max_seq_length=382)
    assert len(recs) == 1
    assert recs[0][0] == "甲甲。乙乙！"


def test_pack_flushes_at_boundary():
    # 3 sentences of length 4; max 8 → first record has 2 sentences
    text = "甲甲甲。乙乙乙。丙丙丙。"
    recs = pack_sentences(text, [], max_seq_length=8)
    assert [r[0] for r in recs] == ["甲甲甲。乙乙乙。", "丙丙丙。"]


def test_pack_never_splits_a_sentence():
    # single sentence longer than max: still one record (flush requires
    # a non-empty buffer before the oversized sentence)
    text = "甲" * 50 + "。"
    recs = pack_sentences(text, [], max_seq_length=8)
    assert len(recs) == 1 and recs[0][0] == text


def test_pack_entity_rebase():
    # entity in second record gets offsets rebased by first record's length
    text = "甲甲甲。乙乙乙。"  # sentences len 4+4, max 4 → two records
    ents = [("disease", 5, 7)]  # 乙乙 in second sentence
    recs = pack_sentences(text, ents, max_seq_length=4)
    assert len(recs) == 2
    assert recs[0][1] == []
    assert recs[1][1] == [("disease", 1, 3)]
    assert recs[1][0][1:3] == "乙乙"


def test_pack_boundary_entity_rolls_forward():
    """Reference quirk: entity with end_pos == record end rolls to the
    next record (strict < at crf_gen_taggers.py:36)."""
    text = "甲甲甲。乙乙乙。"
    ents = [("disease", 2, 4)]  # ends exactly at first record boundary
    recs = pack_sentences(text, ents, max_seq_length=4)
    assert len(recs) == 2
    assert recs[0][1] == []  # NOT in record 0 despite being inside it
    assert recs[1][1] == [("disease", -2, 0)]  # rebased negative — quirk kept


@given(st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_pack_covers_all_sentences_in_order(lengths):
    text = "".join("甲" * (n - 1) + "。" for n in lengths)
    recs = pack_sentences(text, [], max_seq_length=25)
    assert "".join(r[0] for r in recs) == text
    sents = to_sentences(text)
    # each record is a concatenation of consecutive whole sentences
    i = 0
    for rec_text, _ in recs:
        acc = ""
        while len(acc) < len(rec_text):
            acc += sents[i]
            i += 1
        assert acc == rec_text
    assert i == len(sents)


def test_bio_tag_basic():
    tags = bio_tag(5, [("disease", 1, 3)])
    assert tags == ["O", "disease-B", "disease-I", "O", "O"]


def test_bio_tag_overlap_last_wins():
    """F5 overwrite semantics (crf_gen_taggers.py:110-122)."""
    tags = bio_tag(5, [("disease", 0, 4), ("medicine", 2, 4)])
    assert tags == ["disease-B", "disease-I", "medicine-B", "medicine-I", "O"]


def test_bio_tag_out_of_range_clipped():
    tags = bio_tag(3, [("disease", 1, 10)])
    assert tags == ["O", "disease-B", "disease-I"]


def test_tags_to_mentions_roundtrip():
    ents = [("disease", 0, 2), ("medicine", 3, 6)]
    tags = bio_tag(8, ents)
    assert tags_to_mentions(tags) == ents


def test_tags_to_mentions_adjacent_same_type():
    tags = ["disease-B", "disease-I", "disease-B", "disease-I"]
    assert tags_to_mentions(tags) == [("disease", 0, 2), ("disease", 2, 4)]


def test_tags_to_mentions_orphan_I_starts_mention():
    tags = ["O", "disease-I", "disease-I", "O"]
    assert tags_to_mentions(tags) == [("disease", 1, 3)]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["disease", "medicine", "symptom"]),
            st.integers(0, 40),
            st.integers(1, 12),
        ),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_bio_roundtrip_non_overlapping(raw):
    # build sorted non-overlapping entities
    ents = []
    pos = 0
    for label, gap, ln in raw:
        s = pos + gap + 1
        ents.append((label, s, s + ln))
        pos = s + ln
    n = pos + 2
    tags = bio_tag(n, ents)
    assert tags_to_mentions(tags) == ents
