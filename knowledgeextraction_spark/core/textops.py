"""Text primitives: sentence segmentation, HTML extract, normalization.

Reference parity:
- ``to_sentences`` / ``merge_symmetry`` reimplement the sentence
  splitter of ``knowledgeextractor/utils/text_segment.py:24-38`` and
  the symmetric-quote merge of ``text_segment.py:6-22`` (semantics
  reproduced from the documented behavior, not copied).
- ``normalize_digits`` reimplements ``chinese_CONLL.py:17-18``
  (``re.sub(r"\\d", "0", w)``).
- The HTML template/extractor pair is the [NORTH] addition: the
  reference has no HTML stage (closest analog is the dirty-JSON-line
  cleaner, ``crf_gen_taggers.py:140-143``); BASELINE.json's input_hint
  mandates an ``html:binary`` column whose extracted text must be
  byte-identical per url to this extractor.
"""

from __future__ import annotations

import html as _htmlmod
import re

# The reference splits on these delimiters, keeping each delimiter
# attached to the sentence it terminates (text_segment.py:27).
_SENT_SPLIT_RE = re.compile(r"(；|，|？|。|！|\…\…)")

_QUOTE_OPEN = "“"   # “
_QUOTE_CLOSE = "”"  # ”


def merge_symmetry(sentences: list[str]) -> list[str]:
    """Merge sentence fragments so a “...” quote stays in one sentence.

    Semantics of text_segment.py:6-22: walk the sentence list keeping a
    ``merged`` flag; an unclosed open-quote sentence starts an open run,
    subsequent sentences are appended to the previous entry until a
    close quote is seen. Finally strip and drop empties.
    """
    out: list[str] = []
    merged = True
    for s in sentences:
        has_open = _QUOTE_OPEN in s
        has_close = _QUOTE_CLOSE in s
        if has_open and not has_close:
            merged = False
            out.append(s)
        elif has_close and not merged:
            merged = True
            out[-1] += s
        elif not has_open and not has_close and not merged:
            out[-1] += s
        else:
            out.append(s)
    return [s.strip() for s in out if s.strip()]


def to_sentences(paragraph: str) -> list[str]:
    """Split a paragraph into sentences, reference semantics.

    text_segment.py:24-38: split on the delimiter set keeping the
    delimiter attached (split-with-capture then pairwise rejoin), strip
    empties, then move a leading ``”`` onto the previous sentence, then
    merge symmetric quotes.
    """
    parts = _SENT_SPLIT_RE.split(paragraph)
    parts.append("")
    sentences = ["".join(p) for p in zip(parts[0::2], parts[1::2])]
    sentences = [s.strip() for s in sentences if s.strip()]
    for j in range(1, len(sentences)):
        if sentences[j] and sentences[j][0] == _QUOTE_CLOSE:
            sentences[j - 1] = sentences[j - 1] + _QUOTE_CLOSE
            sentences[j] = sentences[j][1:]
    # the leading-quote fixup can leave empties; the merge pass strips them
    return merge_symmetry(sentences)


_DIGIT_RE = re.compile(r"\d")


def normalize_digits(s: str) -> str:
    """``re.sub(r"\\d", "0", s)`` — chinese_CONLL.py:17-18 semantics."""
    return _DIGIT_RE.sub("0", s)


# --------------------------------------------------------------------------
# HTML template + byte-exact extractor [NORTH]
#
# The fixture generator wraps ``text`` in this deterministic template;
# ``extract_text`` must invert it byte-identically per url. The template
# deliberately exercises: nav/footer boilerplate, attribute noise, HTML
# entity escaping, and multi-paragraph bodies.
# --------------------------------------------------------------------------

_HTML_TEMPLATE = (
    "<!DOCTYPE html>\n"
    "<html lang=\"{lang}\">\n"
    "<head><meta charset=\"utf-8\"/><title>{title}</title>\n"
    "<script>var t={{\"x\":1}};</script>\n"
    "<style>.nav{{color:#333}}</style></head>\n"
    "<body>\n"
    "<nav class=\"nav\"><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>\n"
    "<main>\n"
    "{paras}\n"
    "</main>\n"
    "<footer>&copy; 2025 example corp &middot; all rights reserved</footer>\n"
    "</body></html>"
)

_PARA_OPEN = "<p data-k=\"{i}\">"
_PARA_CLOSE = "</p>"
_PARA_SEP = "\n"


def render_html(text: str, lang: str, title: str = "") -> bytes:
    """Wrap extracted text into the deterministic page template.

    ``text`` paragraphs are split on ``\\n``; each paragraph is HTML-
    escaped and wrapped in a ``<p>``. The inverse is ``extract_text``.
    """
    paras = _PARA_SEP.join(
        _PARA_OPEN.format(i=i) + _htmlmod.escape(p, quote=False) + _PARA_CLOSE
        for i, p in enumerate(text.split("\n"))
    )
    return _HTML_TEMPLATE.format(lang=lang, title=_htmlmod.escape(title, quote=False), paras=paras).encode(
        "utf-8"
    )


_MAIN_RE = re.compile(rb"<main>\n(.*)\n</main>", re.DOTALL)
_P_RE = re.compile(r"<p data-k=\"\d+\">(.*?)</p>", re.DOTALL)


def extract_text(html_bytes: bytes) -> str:
    """Byte-exact inverse of ``render_html`` (the per-row invariant).

    Finds the ``<main>`` block, pulls each ``<p>`` body, unescapes HTML
    entities, joins paragraphs with ``\\n``. Deterministic pure function
    — the oracle and the Spark pandas_udf call this same code object.
    """
    m = _MAIN_RE.search(html_bytes)
    if m is None:
        return ""
    body = m.group(1).decode("utf-8")
    paras = _P_RE.findall(body)
    return "\n".join(_htmlmod.unescape(p) for p in paras)
