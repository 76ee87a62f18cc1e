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


def _artifact_path(filename: str) -> str:
    import os

    d = os.environ.get("SPARKKG_ARTIFACTS_DIR")
    if not d:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        # under spark-submit --py-files the package lives INSIDE a zip;
        # fall back to the submitter's cwd (ship the npz files alongside
        # or set SPARKKG_ARTIFACTS_DIR explicitly on a cluster)
        base = repo_root if os.path.isdir(repo_root) else os.getcwd()
        d = os.path.join(base, ".artifacts")
    return os.path.join(d, filename)


def _cached_npz(filename: str, build):
    """Load ``filename`` from the artifact dir, or build + atomically
    save it.  ``build`` returns the weights dict."""
    import os

    path = _artifact_path(filename)
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    weights = build()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **weights)
    os.replace(tmp, path)
    return weights


@lru_cache(maxsize=1)
def get_weights() -> dict[str, np.ndarray]:
    """Deterministic trained weights (same object on repeated calls).

    Disk-cached (npz): the ridge fit costs ~40 s once; the Spark
    pipeline computes this on the DRIVER only and ships the dict to
    executors via ``sc.broadcast`` (crf_albert.py:199-206 warm-start
    analog) — executors never call this.
    """
    return _cached_npz("weights_v1.npz", _build_base_weights)


def _build_base_weights() -> dict[str, np.ndarray]:
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
    return weights


# --------------------------------------------------------------------------
# MRC span head (M4) — start/end/cls ridge fits over the shared encoder
# --------------------------------------------------------------------------

MRC_TRAIN_PAGES = 240


def fit_span_head(weights: dict[str, np.ndarray], seed: int = TRAIN_SEED) -> None:
    """Ridge-fit the MRC start/end/cls heads (mrc_albert.py:82-150's
    three outputs) onto fixture gold spans, mutating ``weights``.

    Same extreme-learning-machine recipe as ``fit_projection``
    (deterministic, closed-form), with chunked Gram accumulation so the
    [positions × MRC_FEAT_DIM] design matrix never materializes: the
    training set is all (page, entity-type) MRC examples of a dedicated
    synthetic split, positives = gold span starts/ends of the queried
    type, cls target = span-has-no-answer.
    """
    from ..fixtures.generator import generate_corpus
    from .labels import ENTITY_TYPES
    from .model import HEAD_DIM, encode_hidden
    from .mrc import QUESTIONS, featurize_example
    from .vocab import build_vocab

    corpus = generate_corpus(n_pages=MRC_TRAIN_PAGES, seed=seed)
    vocab = build_vocab()
    nt = len(ENTITY_TYPES)
    d = HEAD_DIM + 1  # + bias column
    l2 = 1e-2
    pos_boost = 30.0  # start/end positives are ~1/300 of positions
    g_s = np.zeros((nt, d, d), dtype=np.float64)
    g_e = np.zeros((nt, d, d), dtype=np.float64)
    r_s = np.zeros((nt, d), dtype=np.float64)
    r_e = np.zeros((nt, d), dtype=np.float64)
    pooled_rows: dict[int, list] = {i: [] for i in range(nt)}
    cls_targets: dict[int, list] = {i: [] for i in range(nt)}

    for page in corpus.pages:
        if page.lang != "zh" or not page.text:
            continue
        for ti, typ in enumerate(ENTITY_TYPES):
            golds = [(s, e) for lab, s, e in page.entities if lab == typ]
            for f in featurize_example(QUESTIONS[typ], page.text, vocab=vocab):
                # trim to the real length: inference virtualizes every
                # position past input_len (span_head_scores ids_pad),
                # so training on 384-wide pad-id-0 rows would skew the
                # last WINDOW positions' features vs serving
                ids = np.asarray([f.input_ids[: f.input_len]], dtype=np.int64)
                h = encode_hidden(ids, weights)[0]  # [input_len, HEAD_DIM]
                ctx = slice(f.doc_offset, f.doc_offset + f.span_length)
                x = np.concatenate(
                    [h[ctx].astype(np.float64), np.ones((f.span_length, 1))],
                    axis=1,
                )
                ys = np.zeros(f.span_length)
                ye = np.zeros(f.span_length)
                has_answer = False
                for s_abs, e_abs in golds:
                    s_rel, e_rel = s_abs - f.span_start, e_abs - 1 - f.span_start
                    if s_rel >= 0 and e_rel < f.span_length:
                        ys[s_rel] = 10.0
                        ye[e_rel] = 10.0
                        has_answer = True
                ws = np.where(ys > 0, pos_boost, 1.0)[:, None]
                we = np.where(ye > 0, pos_boost, 1.0)[:, None]
                xs, xe = x * np.sqrt(ws), x * np.sqrt(we)
                g_s[ti] += xs.T @ xs
                g_e[ti] += xe.T @ xe
                r_s[ti] += xs.T @ (ys * ws[:, 0])
                r_e[ti] += xe.T @ (ye * we[:, 0])
                pooled = h[: f.input_len].mean(axis=0).astype(np.float64)
                pooled_rows[ti].append(np.concatenate([pooled, [1.0]]))
                cls_targets[ti].append(0.0 if has_answer else 10.0)

    eye = l2 * np.eye(d)
    mrc_ws = np.zeros((nt, HEAD_DIM), dtype=np.float32)
    mrc_bs = np.zeros(nt, dtype=np.float32)
    mrc_we = np.zeros((nt, HEAD_DIM), dtype=np.float32)
    mrc_be = np.zeros(nt, dtype=np.float32)
    mrc_wc = np.zeros((nt, HEAD_DIM), dtype=np.float32)
    mrc_bc = np.zeros(nt, dtype=np.float32)
    for ti in range(nt):
        sol_s = np.linalg.solve(g_s[ti] + eye, r_s[ti])
        sol_e = np.linalg.solve(g_e[ti] + eye, r_e[ti])
        xc = np.asarray(pooled_rows[ti])
        yc = np.asarray(cls_targets[ti])
        sol_c = np.linalg.solve(xc.T @ xc + l2 * np.eye(d), xc.T @ yc)
        mrc_ws[ti], mrc_bs[ti] = sol_s[:-1], sol_s[-1]
        mrc_we[ti], mrc_be[ti] = sol_e[:-1], sol_e[-1]
        mrc_wc[ti], mrc_bc[ti] = sol_c[:-1], sol_c[-1]

    weights["mrc_ws"], weights["mrc_bs"] = mrc_ws, mrc_bs
    weights["mrc_we"], weights["mrc_be"] = mrc_we, mrc_be
    weights["mrc_wc"], weights["mrc_bc"] = mrc_wc, mrc_bc


@lru_cache(maxsize=1)
def get_mrc_weights() -> dict[str, np.ndarray]:
    """Encoder weights + fitted MRC span heads, disk-cached like
    ``get_weights`` (driver-only; executors receive the broadcast)."""
    def build():
        weights = dict(get_weights())
        fit_span_head(weights)
        return weights

    return _cached_npz("mrc_v1.npz", build)


# --------------------------------------------------------------------------
# NRE relation head (M7) — ridge softmax over the M6 pair encodings
# --------------------------------------------------------------------------

NRE_TRAIN_PAGES = 400


def nre_relation_labels() -> list[str]:
    """Class list: 'NA' + the doc-world rule predicates, sorted.
    Index = class id (deterministic)."""
    from ..sources.pages import doc_rules

    return ["NA"] + sorted({r.predicate for r in doc_rules()})


def fit_relation_head(weights: dict[str, np.ndarray], seed: int = TRAIN_SEED) -> None:
    """Ridge-fit the relation classifier (SoftmaxNN surrogate,
    models.py:31-41) over M6 entity-marked encodings, mutating
    ``weights`` (adds nre_w [D, C], nre_b [C]).

    Training pairs come from a dedicated synthetic doc-world split:
    random DOC_WORDS sequences transliterated through word_mapping (the
    exact text distribution the relation query sees), gold entity spans
    tracked during construction, candidates = ordered pairs with no
    sentence delimiter between (the triple stage's gate), label = the
    doc-world rule predicate when the rule's connective occurs in the
    between-text, else 'NA'.
    """
    from ..operators.triples import DELIMITERS
    from ..sources.pages import DOC_WORDS, dictionary, doc_rules, word_mapping
    from .nre import record_pair_features
    from .vocab import build_vocab

    vocab = build_vocab()
    mapping = word_mapping()
    entities, _ = dictionary()
    type_of_surface = {e.canonical_name: e.label_type for e in entities}

    from ..core.labels import ENTITY_TYPES
    from .model import HEAD_DIM
    from .nre import MARKER_DIM, POOL_DIM

    conn_patterns = sorted({r.pattern for r in doc_rules()})
    type_idx = {t: i for i, t in enumerate(ENTITY_TYPES)}

    rng = np.random.default_rng(seed)
    sentences = []  # (text, [(hs, he, ts, te)], [type pair], [conn flags])
    for _ in range(4000):
        words = rng.choice(DOC_WORDS, size=int(rng.integers(6, 16)))
        pos = 0
        spans = []  # (type, start, end)
        parts = []
        for w in words:
            snippet = mapping[w]
            typ = type_of_surface.get(snippet)
            if typ is not None:
                spans.append((typ, pos, pos + len(snippet)))
            parts.append(snippet)
            pos += len(snippet)
        text = "".join(parts)
        prs, tps, cfs = [], [], []
        for i, (l1, s1, e1) in enumerate(spans):
            for l2, s2, e2 in spans[i + 1 :]:
                if s2 <= s1:
                    continue
                between = text[e1:s2]
                if any(d in between for d in DELIMITERS):
                    continue
                prs.append((s1, e1, s2, e2))
                tps.append((type_idx[l1], type_idx[l2]))
                cfs.append([1.0 if p in between else 0.0 for p in conn_patterns])
        if prs:
            sentences.append((text, prs, tps, cfs))

    # two ridge fits over the pair features:
    # - type head on the marker blocks (8 classes, head + tail rows)
    # - per-connective presence detectors on the pooled between blocks
    n_types = len(ENTITY_TYPES)
    n_conn = len(conn_patterns)
    l2reg = 1e-2
    d_t = HEAD_DIM + 1
    d_c = POOL_DIM + 1
    g_t = np.zeros((d_t, d_t))
    r_t = np.zeros((d_t, n_types))
    g_c = np.zeros((d_c, d_c))
    r_c = np.zeros((d_c, n_conn))
    for text, prs, tps, cfs in sentences:
        x = record_pair_features(text, prs, weights, vocab)
        n = len(x)
        ones = np.ones((n, 1))
        h_feat = np.concatenate([x[:, :HEAD_DIM], ones], axis=1)
        t_feat = np.concatenate([x[:, HEAD_DIM:MARKER_DIM], ones], axis=1)
        pool = np.concatenate(
            [x[:, MARKER_DIM : MARKER_DIM + POOL_DIM], ones], axis=1
        )
        y_h = np.zeros((n, n_types))
        y_t = np.zeros((n, n_types))
        y_h[np.arange(n), [a for a, _ in tps]] = 10.0
        y_t[np.arange(n), [b for _, b in tps]] = 10.0
        g_t += h_feat.T @ h_feat + t_feat.T @ t_feat
        r_t += h_feat.T @ y_h + t_feat.T @ y_t
        y_c = np.asarray(cfs) * 10.0
        g_c += pool.T @ pool
        r_c += pool.T @ y_c

    weights["nre_type_w"] = np.linalg.solve(g_t + l2reg * np.eye(d_t), r_t)
    weights["nre_conn_w"] = np.linalg.solve(g_c + l2reg * np.eye(d_c), r_c)


@lru_cache(maxsize=1)
def get_nre_weights() -> dict[str, np.ndarray]:
    """Encoder weights + fitted NRE relation head, disk-cached."""
    def build():
        weights = dict(get_weights())
        fit_relation_head(weights)
        return weights

    return _cached_npz("nre_v1.npz", build)
