"""Greedy sentence packing (W3) — order-dependent, exact reference semantics.

Reimplements ``ExampleSementer.seg_single_exmple``
(``crf_gen_taggers.py:49-88``) and its ``_get_record`` offset rebase
(``crf_gen_taggers.py:32-47``): sentences from ``to_sentences`` are
greedily accumulated; when adding the next sentence would exceed
``max_seq_length`` and the buffer is non-empty, flush a record. Entities
are consumed in order while ``end_pos < offset + cur_len`` (STRICT less
— an entity ending exactly at the boundary rolls to the next record;
this is a reference quirk we replicate for parity), with start/end
rebased by the running offset. Entities must be pre-sorted by
``start_pos`` (the reference sorts at crf_gen_taggers.py:286).

Not expressible as a plain running-sum window (a sentence that straddles
the boundary changes subsequent bucket assignment), hence
``groupBy(url).applyInPandas`` on the Spark side — see SURVEY.md §2.5 W3.
"""

from __future__ import annotations

from .textops import to_sentences

Entity = tuple[str, int, int]  # (label_type, start_pos, end_pos)


def pack_sentences(
    text: str,
    entities: list[Entity],
    max_seq_length: int = 382,
) -> list[tuple[str, list[Entity]]]:
    """→ [(packed_text, rebased_entities)] in order."""
    sentences = to_sentences(text)

    records: list[tuple[str, list[Entity]]] = []
    txts: list[str] = []
    cur_len = 0
    offset = 0
    pos = 0

    def flush() -> None:
        nonlocal cur_len, offset, pos, txts
        ents: list[Entity] = []
        while pos < len(entities) and entities[pos][2] < offset + cur_len:
            label, s, e = entities[pos]
            ents.append((label, s - offset, e - offset))
            pos += 1
        offset += cur_len
        cur_len = 0
        records.append(("".join(txts), ents))
        txts = []

    for sent in sentences:
        if cur_len + len(sent) > max_seq_length and txts:
            flush()
        cur_len += len(sent)
        txts.append(sent)

    if cur_len > 0:
        flush()
    return records
