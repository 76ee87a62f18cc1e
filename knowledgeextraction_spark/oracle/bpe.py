"""Independent single-node BPE-training oracle (pure python, no
Spark) — defines the golden ``bpe_merges`` parquet that the driver's
DuckDB check reads back, exactly the crf_fit/docworld pattern: merge
APPLICATION is not SQL-expressible, so the oracle is an independent
reimplementation whose output is committed.

Semantics (Sennrich et al. 2016, the word-frequency-table
formulation): words are whitespace tokens of the normalized text;
each starts as its character sequence plus a ``</w>`` terminal; per
round, the highest-frequency adjacent symbol pair (ties: lexicographic
smallest (left, right) — UTF-8 byte order == code-point order, so
Spark and python agree) merges everywhere, greedily left-to-right
within a word.  Counts are exact integers — no float drift anywhere.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

N_MERGES = 20
END_MARK = "</w>"


def word_freqs(sf_dir: str) -> Counter:
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    freqs: Counter = Counter()
    for text in tbl.column("text").to_pylist():
        norm = re.sub(r"\s+", " ", (text or "").strip().lower())
        for w in norm.split(" "):
            if w:
                freqs[w] += 1
    return freqs


def train_bpe(freqs: Counter, n_merges: int = N_MERGES):
    """→ [(rank, left, right, freq)] — stops early if pairs run out."""
    vocab = {tuple(w) + (END_MARK,): f for w, f in freqs.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), f = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, f))
        new_vocab = {}
        for syms, fr in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + fr
        vocab = new_vocab
    return merges


def merges_frame(sf_dir: str, n_merges: int = N_MERGES) -> pd.DataFrame:
    rows = train_bpe(word_freqs(sf_dir), n_merges)
    return pd.DataFrame(rows, columns=["rank", "left", "right", "freq"]).astype(
        {"rank": "int64", "freq": "int64"}
    )


def encode_word(word: str, merges) -> int:
    """apply the merge sequence (rank order) to one word; → #tokens."""
    syms = list(word) + [END_MARK]
    for _rank, a, b, _f in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def token_counts_frame(sf_dir: str, n_merges: int = N_MERGES) -> pd.DataFrame:
    """per-doc (doc_id, n_words, n_bpe_tokens) under the corpus-trained
    merges — each distinct word encoded once (the Spark shape)."""
    merges = train_bpe(word_freqs(sf_dir), n_merges)
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cache: dict[str, int] = {}
    rows = []
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        norm = re.sub(r"\s+", " ", (text or "").strip().lower())
        words = [w for w in norm.split(" ") if w]
        if not words:
            continue
        n_tok = 0
        for w in words:
            if w not in cache:
                cache[w] = encode_word(w, merges)
            n_tok += cache[w]
        rows.append((doc_id, len(words), n_tok))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_words", "n_bpe_tokens"]
    ).astype({"doc_id": "int64", "n_words": "int64", "n_bpe_tokens": "int64"})


def write_golden(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    merges_frame(sf_dir).to_parquet(f"{out_dir}/bpe_merges.parquet", index=False)
    token_counts_frame(sf_dir).to_parquet(
        f"{out_dir}/bpe_token_counts.parquet", index=False
    )


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "golden",
        os.path.basename(sf.rstrip("/")),
    )
    write_golden(sf, out)
    print(f"bpe golden written to {out}")
