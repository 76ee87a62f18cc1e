"""Model artifacts: deterministic surrogate weights, built once, cached.

Mirrors FIXTURES.md §6: seeded encoder weights with the reference's
architecture shape at toy size, a ridge-fit projection (trained on a
dedicated synthetic split, seed 7, disjoint from every test corpus
seed), and a BIO-validity CRF transition matrix
(``crf_albert.py:155-166`` shape). The weights dict is what the Spark
pipeline broadcasts (one deserialize per executor — the reference's
warm-start analog, ``crf_albert.py:199-206``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .bio import bio_tag
from .featurize import convert_single_example
from .labels import LABELS, NUM_LABELS
from .model import fit_projection, init_encoder_weights, make_bio_transitions
from .packing import pack_sentences
from .vocab import build_vocab, vocab_size

TRAIN_SEED = 7
TRAIN_PAGES = 600
CLUSTER_SCALE = 2.5


def _add_semantic_clusters(emb: np.ndarray, seed: int = 43) -> None:
    """Give the char embedding 'pretrained' structure.

    Real pretrained char embeddings cluster by semantic role; we add a
    fixed random unit direction per role pool (each entity type, filler,
    connectives, delimiters) to its chars' vectors. Purely a property of
    the surrogate weights — shared by oracle and pipeline, so parity is
    unaffected.
    """
    from ..fixtures.generator import (
        _CONNECTIVE_POOL,
        _FILLER_POOL,
        _type_chars,
        DELIMS,
    )
    from .labels import ENTITY_TYPES

    vocab = build_vocab()
    rng = np.random.default_rng(seed)
    pools = [_type_chars(i) for i in range(len(ENTITY_TYPES))]
    pools += [_FILLER_POOL, _CONNECTIVE_POOL, list(DELIMS)]
    for pool in pools:
        mu = rng.standard_normal(emb.shape[1]).astype(np.float32)
        mu /= np.linalg.norm(mu)
        for ch in pool:
            if ch in vocab:
                emb[vocab[ch]] += CLUSTER_SCALE * mu


def _cache_path() -> "os.PathLike[str] | str":
    import os

    d = os.environ.get("SPARKKG_ARTIFACTS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".artifacts",
    )
    return os.path.join(d, "weights_v1.npz")


@lru_cache(maxsize=1)
def get_weights() -> dict[str, np.ndarray]:
    """Deterministic trained weights (same object on repeated calls).

    Disk-cached (npz): the ridge fit costs ~40 s once; the Spark
    pipeline computes this on the DRIVER only and ships the dict to
    executors via ``sc.broadcast`` (crf_albert.py:199-206 warm-start
    analog) — executors never call this.
    """
    import os

    path = _cache_path()
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    from ..fixtures.generator import generate_corpus

    weights = init_encoder_weights(vocab_size(), NUM_LABELS, seed=42)
    _add_semantic_clusters(weights["emb"])
    weights["trans"] = make_bio_transitions(LABELS)

    corpus = generate_corpus(n_pages=TRAIN_PAGES, seed=TRAIN_SEED)
    vocab = build_vocab()
    ids_rows, label_rows, mask_rows = [], [], []
    for page in corpus.pages:
        if page.lang != "zh":
            continue
        for text, ents in pack_sentences(page.text, page.entities):
            tags = bio_tag(len(text), ents)
            input_ids, input_mask, _seg, label_ids = convert_single_example(
                text, tags, vocab=vocab
            )
            ids_rows.append(input_ids)
            label_rows.append(label_ids)
            mask_rows.append(input_mask)

    input_ids = np.asarray(ids_rows, dtype=np.int64)
    label_ids = np.asarray(label_rows, dtype=np.int64)
    mask = np.asarray(mask_rows, dtype=np.int64)
    fit_projection(weights, input_ids, label_ids, mask)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **weights)
    os.replace(tmp, path)
    return weights
