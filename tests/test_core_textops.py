"""Per-row invariants for text ops (SURVEY.md §5 item 1).

to_sentences must match the reference splitter's semantics
(text_segment.py:24-38): delimiter kept attached, strip empties,
leading-close-quote fixup, symmetric-quote merge.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgeextraction_spark.core.textops import (
    extract_text,
    merge_symmetry,
    normalize_digits,
    render_html,
    to_sentences,
)


def test_to_sentences_basic_delimiters():
    assert to_sentences("你好。世界！") == ["你好。", "世界！"]
    assert to_sentences("甲，乙；丙？丁") == ["甲，", "乙；", "丙？", "丁"]


def test_to_sentences_ellipsis():
    assert to_sentences("甲……乙。") == ["甲……", "乙。"]


def test_to_sentences_strips_and_drops_empties():
    assert to_sentences("  甲。  ") == ["甲。"]
    assert to_sentences("。。甲。") == ["。", "。", "甲。"]
    assert to_sentences("") == []
    assert to_sentences("   ") == []


def test_to_sentences_leading_close_quote_moves_back():
    # “...。” — the close quote lands at the start of the next fragment
    # and is moved back onto the previous sentence (text_segment.py:33-36)
    out = to_sentences("他说“你好。”然后走了。")
    assert out == ["他说“你好。”", "然后走了。"]


def test_merge_symmetry_open_quote_spans_sentences():
    out = to_sentences("“甲，乙。”丙。")
    # open-quote sentence absorbs following fragments until close
    assert out == ["“甲，乙。”", "丙。"]


def test_merge_symmetry_plain():
    assert merge_symmetry(["a", "b"]) == ["a", "b"]
    assert merge_symmetry(["“x，", "y”", "z。"]) == ["“x，y”", "z。"]


@given(st.text(alphabet="abc甲乙丙，。！？…“”；", max_size=60))
@settings(max_examples=300, deadline=None)
def test_to_sentences_reconstruction_property(s):
    """Sentences, re-joined, contain every non-space char in order.

    (Exact reconstruction doesn't hold — strip() drops whitespace —
    but no non-whitespace content may be lost or reordered.)"""
    out = to_sentences(s)
    joined = "".join(out)
    want = "".join(ch for ch in s if not ch.isspace())
    # allow for quote-fixup churn: multiset + order of non-space chars preserved
    assert joined.replace(" ", "") == want


def test_normalize_digits():
    assert normalize_digits("abc123x9") == "abc000x0"
    assert normalize_digits("no digits") == "no digits"


def test_html_roundtrip_byte_identical():
    texts = [
        "你好。世界！",
        "multi\nparagraph\ntext",
        "entities & <tags> 'quoted' \"double\"",
        "",
        "trailing newline\n",
    ]
    for t in texts:
        html = render_html(t, "zh", title="t&1")
        assert extract_text(html) == t, repr(t)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
@settings(max_examples=200, deadline=None)
def test_html_roundtrip_property(t):
    assert extract_text(render_html(t, "zh")) == t
