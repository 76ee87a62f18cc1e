"""Deterministic multimodal fixture: real PPM/WAVE/video bytes from doc_ids.

Drives the driver-gated ``multimodal_features`` query: every parameter
below is chosen so the decoded feature values are (a) produced by the
REAL byte-level decoders in operators/multimodal.py — header parse,
chunk walk, frame walk all execute — and (b) closed-form computable
from ``doc_id`` in DuckDB SQL, with every value either dyadic (exact in
float32) or exactly representable at 6 decimals, so the float32 feature
column can never round differently from the float64 oracle.

Per doc_id (kind = doc_id % 3 → image / audio / video):

- image: w×h P6 PPM, maxval 128, constant per-channel pixels
  r = doc_id % 128, g = (2·doc_id + 1) % 128, b = (5·doc_id + 2) % 128,
  w = 4 + doc_id % 3, h = 3 + doc_id % 2  (single-digit dims → 11-byte
  header).  Constant channels → per-channel std 0.
- audio: RIFF/WAVE PCM-16 mono, sr = 8000·(1 + doc_id % 4),
  n = 256 + 2·(doc_id % 8) samples (always even → half-energy ratio is
  exactly 0.5), constant amplitude a = doc_id % 1001 − 500 (dyadic
  a/32768 → rms = mean|x| = peak exactly |a|/32768, zcr 0).
- video: three identical frames of the image PPM — the frame walk and
  first/middle/last sampling run for real; identical frames keep the
  averaged features dyadic.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.multimodal import MEDIA_SCHEMA

PPM_MAXVAL = 128


def image_params(doc_id: int) -> tuple[int, int, int, int, int]:
    """→ (w, h, r, g, b) for the image/video kinds."""
    return (
        4 + doc_id % 3,
        3 + doc_id % 2,
        doc_id % PPM_MAXVAL,
        (2 * doc_id + 1) % PPM_MAXVAL,
        (5 * doc_id + 2) % PPM_MAXVAL,
    )


def audio_params(doc_id: int) -> tuple[int, int, int]:
    """→ (sample_rate, n_samples, amplitude)."""
    return 8000 * (1 + doc_id % 4), 256 + 2 * (doc_id % 8), doc_id % 1001 - 500


def make_ppm(w: int, h: int, rgb: tuple[int, int, int], maxval: int = PPM_MAXVAL) -> bytes:
    header = f"P6\n{w} {h}\n{maxval}\n".encode()
    return header + bytes(rgb) * (w * h)


def make_wav(sr: int, n: int, amp: int, n_ch: int = 1) -> bytes:
    data = struct.pack(f"<{n}h", *([amp] * n))
    fmt = struct.pack("<HHIIHH", 1, n_ch, sr, sr * n_ch * 2, n_ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_payload(doc_id: int) -> tuple[str, bytes, int | None, int | None]:
    """→ (kind, payload, width, height) for one doc_id."""
    kind = ("image", "audio", "video")[doc_id % 3]
    if kind == "audio":
        sr, n, amp = audio_params(doc_id)
        return kind, make_wav(sr, n, amp), None, None
    w, h, r, g, b = image_params(doc_id)
    frame = make_ppm(w, h, (r, g, b))
    return kind, frame if kind == "image" else frame * 3, w, h


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, ...) → media(media_id, kind, payload, width,
    height).  Payload synthesis is a narrow mapInPandas on the scan
    partitions — like the decode stage, the bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_payload(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": [r[0] for r in rows],
                    "payload": [r[1] for r in rows],
                    "width": pd.Series([r[2] for r in rows], dtype="Int32"),
                    "height": pd.Series([r[3] for r in rows], dtype="Int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)
