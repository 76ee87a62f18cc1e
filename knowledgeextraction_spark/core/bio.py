"""BIO tagging and its inverse (mention decoding).

``bio_tag`` reimplements the reference's F5 rule
(``crf_gen_taggers.py:102-128``): start from all-``O``, then for each
entity ``[s, e)`` write ``label-I`` on every char and ``label-B`` on the
first char. Later entities OVERWRITE earlier ones (order matters — the
reference iterates the record's entity list as-is; for determinism our
callers sort entities by ``start_pos`` first, matching the reference's
own sort at crf_gen_taggers.py:286).

``tags_to_mentions`` is the inverse decode used downstream of the CRF:
a mention starts at a ``-B`` tag (or a ``-I`` whose predecessor is not
the same type — robustness for model output) and extends through
consecutive same-type ``-I`` tags.
"""

from __future__ import annotations

from .labels import bio_split


def bio_tag(text_len: int, entities: list[tuple[str, int, int]]) -> list[str]:
    """entities: (label_type, start_pos, end_pos) with exclusive end."""
    tags = ["O"] * text_len
    for label, s, e in entities:
        for i in range(s, min(e, text_len)):
            tags[i] = label + ("-B" if i == s else "-I")
    return tags


def tags_to_mentions(tags: list[str]) -> list[tuple[str, int, int]]:
    """→ [(label_type, start_pos, end_pos)] with exclusive end, sorted by start."""
    mentions: list[tuple[str, int, int]] = []
    cur_type: str | None = None
    cur_start = 0
    for i, tag in enumerate(tags):
        typ, pos = bio_split(tag)
        if pos == "B":
            if cur_type is not None:
                mentions.append((cur_type, cur_start, i))
            cur_type, cur_start = typ, i
        elif pos == "I":
            if cur_type != typ:
                # I without matching B: treat as a new mention start
                if cur_type is not None:
                    mentions.append((cur_type, cur_start, i))
                cur_type, cur_start = typ, i
        else:  # O
            if cur_type is not None:
                mentions.append((cur_type, cur_start, i))
                cur_type = None
    if cur_type is not None:
        mentions.append((cur_type, cur_start, len(tags)))
    return mentions
