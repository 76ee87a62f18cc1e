"""Label space: the reference's fixed, ordered 17-tag BIO list.

``config/labels`` in the reference is an ordered file; label id = line
position (``crf_utils.py:64-70`` loads it, ``crf_processor.py:78-79``
builds ``{label: index}``). The reference uses *suffix* BIO format
(``disease-B``), eight entity types plus ``O``. Order is semantic (id 0
must be ``O``: it is the pad/CLS/SEP label, ``crf_utils.py:174-193``).
"""

from __future__ import annotations

ENTITY_TYPES: list[str] = [
    "examination",
    "operation",
    "disease",
    "medicine",
    "organization",
    "diagnosis",
    "symptom",
    "department",
]

# Fixed order = label id, mirroring config/labels line order.
LABELS: list[str] = ["O"] + [t + s for t in ENTITY_TYPES for s in ("-B", "-I")]

LABEL_MAP: dict[str, int] = {lab: i for i, lab in enumerate(LABELS)}
INV_LABEL_MAP: dict[int, str] = {i: lab for lab, i in LABEL_MAP.items()}

NUM_LABELS = len(LABELS)
O_ID = LABEL_MAP["O"]

assert NUM_LABELS == 17 and O_ID == 0


def bio_split(label: str) -> tuple[str, str]:
    """``disease-B`` → (``disease``, ``B``); ``O`` → (``O``, ``O``).

    Suffix-format split (the reference builds tags as ``label+"-B"`` /
    ``label+"-I"``, crf_gen_taggers.py:113-121).
    """
    if label == "O":
        return "O", "O"
    typ, _, pos = label.rpartition("-")
    return typ, pos
