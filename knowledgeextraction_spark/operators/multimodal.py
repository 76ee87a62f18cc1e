"""Multimodal columns: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages so the (large) payload bytes never enter a
shuffle — only the small feature vectors flow downstream.

The decoders are REAL and dependency-free (this container has no
PIL/torchaudio/ffmpeg):

- image: binary PPM (P6) — header parse (comments, maxval) + pixel
  stats per channel,
- audio: RIFF/WAVE PCM-16 — fmt/data chunk walk + waveform stats,
- video: concatenated PPM frames — frame-sample first/middle/last and
  average their image features (the sampling pattern a real codec
  plugs into).

Unknown formats raise ``ValueError`` naming the format — no silent
fake features.  Swapping in PIL/torchaudio/ffmpeg touches only the
three ``_decode_*`` functions; schema, batching, and shuffle shape
stay as-is.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 8


def _parse_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray, int]:
    """P6 PPM → (width, height, maxval, pixels [h, w, 3] uint8, end offset)."""
    if payload[:2] != b"P6":
        raise ValueError("image decode: only binary PPM (P6) supported here")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    n = w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)
    return w, h, maxval, px, pos + n


def _decode_image(payload: bytes) -> list[float]:
    """PPM pixel stats: [w/4096, h/4096, mean RGB / maxval (3),
    std RGB averaged / maxval, min/maxval, max/maxval]."""
    w, h, maxval, px, _ = _parse_ppm(payload)
    pxf = px.astype(np.float64)
    mean = pxf.mean(axis=(0, 1)) / maxval
    std = float(pxf.std(axis=(0, 1)).mean()) / maxval
    return [
        w / 4096.0,
        h / 4096.0,
        float(mean[0]),
        float(mean[1]),
        float(mean[2]),
        std,
        float(pxf.min()) / maxval,
        float(pxf.max()) / maxval,
    ]


def _decode_audio(payload: bytes) -> list[float]:
    """RIFF/WAVE PCM-16 waveform stats: [sr/48k, n/1e6, rms, mean|x|,
    peak, zero-crossing rate, first-half/second-half energy ratio,
    n_channels/8]."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("audio decode: only RIFF/WAVE supported here")
    pos = 12
    sr = n_ch = bits = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _fmt, n_ch, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            if bits != 16:
                raise ValueError(f"audio decode: PCM-16 only, got {bits}-bit")
            samples = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
        pos += 8 + size + (size & 1)
    if sr is None or samples is None:
        raise ValueError("audio decode: missing fmt or data chunk")
    n = len(samples)
    rms = float(np.sqrt((samples**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(samples)) != 0).mean()) if n > 1 else 0.0
    half = n // 2
    e1 = float((samples[:half] ** 2).sum()) + 1e-12
    e2 = float((samples[half:] ** 2).sum()) + 1e-12
    return [
        sr / 48000.0,
        n / 1e6,
        rms,
        float(np.abs(samples).mean()) if n else 0.0,
        float(np.abs(samples).max()) if n else 0.0,
        zcr,
        e1 / (e1 + e2),
        (n_ch or 0) / 8.0,
    ]


def _decode_video(payload: bytes, max_frames: int = 3) -> list[float]:
    """Concatenated-PPM 'video': walk the frame sequence, sample
    first/middle/last, average their image features (W1-style frame
    sampling; a real codec replaces the walk + decode only)."""
    offsets = []
    pos = 0
    while pos < len(payload) and payload[pos : pos + 2] == b"P6":
        _w, _h, _mv, _px, end = _parse_ppm(payload[pos:])
        offsets.append((pos, pos + end))
        pos += end
    if not offsets:
        raise ValueError("video decode: no PPM frames found")
    n = len(offsets)
    picks = sorted({0, n // 2, n - 1})[:max_frames]
    feats = np.array(
        [_decode_image(payload[offsets[i][0] : offsets[i][1]]) for i in picks]
    )
    return [float(x) for x in feats.mean(axis=0)]


_DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_video}


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    dec = _DECODERS.get(kind)
    if dec is None:
        raise ValueError(f"unknown media kind: {kind!r}")
    return dec(bytes(payload))


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of one P6 frame (the dependency-free
    stand-in for a PIL/opencv resize — swapping libraries touches only
    this function).  Index map: src = floor(dst · src_dim / dst_dim),
    the classic nearest-neighbor convention."""
    w, h, maxval, px, _ = _parse_ppm(payload)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    out = px[ys][:, xs]  # [out_h, out_w, 3]
    return f"P6\n{out_w} {out_h}\n{maxval}\n".encode() + out.tobytes()


def _resize_payload(payload: bytes, kind: str, out_w: int, out_h: int) -> bytes:
    if kind == "image":
        return resize_ppm(bytes(payload), out_w, out_h)
    if kind == "video":
        # walk the concatenated frames, resize each (frame count kept)
        payload = bytes(payload)
        frames = []
        pos = 0
        while pos < len(payload) and payload[pos : pos + 2] == b"P6":
            _w, _h, _mv, _px, end = _parse_ppm(payload[pos:])
            frames.append(resize_ppm(payload[pos : pos + end], out_w, out_h))
            pos += end
        if not frames:
            raise ValueError("video resize: no PPM frames found")
        return b"".join(frames)
    return bytes(payload)  # audio: passthrough


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """media → media with image/video payloads resampled to
    (out_w, out_h) and metadata updated; audio passes through.  Same
    shuffle contract as extract_features: mapInPandas on the scan
    partitions, payload bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _resize_payload(p, k, out_w, out_h)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            visual = pdf["kind"].isin(["image", "video"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": pdf["width"].where(~visual, out_w).astype("Int32"),
                    "height": pdf["height"].where(~visual, out_h).astype("Int32"),
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload, ...) → (media_id, kind, n_bytes, feature).

    mapInPandas keeps the (potentially large) payload column out of any
    shuffle: decode happens on the scan partition, only the small
    feature vector flows downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else str(p).encode("utf-8")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "feature": [
                        _decode_payload(p, k) for p, k in zip(payloads, pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
