"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Uncompressed formats decode for REAL in pure Python/numpy: binary PPM
(P6) images and RIFF/WAVE PCM16 audio run end-to-end through the feature
stage with no external codec. Compressed formats (JPEG/PNG/MP3/video)
still need PIL/torchaudio/ffmpeg, which are NOT in this container — that
boundary stays stubbed behind ``NotImplementedError``. Everything Spark
owns is real and tested either way: the schema contract, Arrow batch
shape through ``mapInPandas``, partition-size control for large blobs,
and the UDF signatures a full decoder drops into.

Design for 100 TB of media: blobs ride a `binary` column next to typed
metadata; per-file work happens in ``mapInPandas`` (Arrow moves the bytes
once); partitioning is by content-hash bucket so hot keys can't form; the
decode stage is a narrow map (no shuffle) whose output is the compact
feature vector, never the raw pixels.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (height, width, 3) uint8 array. Pure Python
    header parse + one numpy frombuffer; handles '#' comments and
    arbitrary whitespace per the netpbm spec."""
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(content):
            raise ValueError("truncated PPM header")
        c = content[pos : pos + 1]
        if c == b"#":  # comment to end of line
            pos = content.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(content) and not content[end : end + 1].isspace():
                end += 1
            fields.append(int(content[pos:end]))
            pos = end
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pos += 1  # single whitespace byte after maxval
    need = width * height * 3
    raster = content[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster: want {need} bytes, have {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Canonical RIFF/WAVE PCM16 -> (samples int16 [n, channels], rate).
    Walks the chunk list (fmt / data may be preceded by others)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only PCM16 WAVE supported")
    samples = np.frombuffer(data[: (len(data) // (2 * channels)) * 2 * channels], dtype="<i2")
    return samples.reshape(-1, channels), rate


def decode_image(content: bytes) -> np.ndarray:
    """Image codec boundary: binary PPM decodes for real; compressed
    formats need PIL/libjpeg (absent in this container)."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    raise NotImplementedError(
        "compressed image decoding requires PIL/libjpeg, not available in this container"
    )


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Audio codec boundary: PCM16 WAVE decodes for real; compressed
    formats need torchaudio/ffmpeg (absent in this container)."""
    if content[:4] == b"RIFF":
        return decode_wav(content)
    raise NotImplementedError(
        "compressed audio decoding requires ffmpeg, not available in this container"
    )


def _fake_feature(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode+embed: md5-seeded pseudo-feature.

    Keeps the full Spark-side contract testable (shape, dtype, batching)
    while the real codec is absent.
    """
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.default_rng(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def _real_feature(kind: str, data: bytes, dim: int) -> list:
    """dim-8 feature from a REAL decode: images (PPM) -> per-channel
    mean/std + log-dims; audio (WAV) -> mean/std/rms/peak + rate/length
    stats. Compressed payloads raise NotImplementedError (stub boundary)."""
    if kind == "image":
        img = decode_image(data).astype(np.float64)
        h, w, _ = img.shape
        v = list(img.mean(axis=(0, 1))) + list(img.std(axis=(0, 1)))
        v += [float(np.log1p(w)), float(np.log1p(h))]
    elif kind == "audio":
        samples, rate = decode_audio(data)
        x = samples.astype(np.float64) / 32768.0
        v = [
            float(x.mean()), float(x.std()),
            float(np.sqrt((x**2).mean())), float(np.abs(x).max()),
            float(np.log1p(rate)), float(np.log1p(x.shape[0])),
            float(x.shape[1]), float(np.diff(x[:, 0]).std()) if x.shape[0] > 1 else 0.0,
        ]
    else:
        raise NotImplementedError(f"no real decoder for kind={kind} (video needs ffmpeg)")
    v = v[:dim] + [0.0] * max(0, dim - len(v))
    return [float(np.float32(t)) for t in v]


def extract_features(media: DataFrame, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """media(media_id, kind, content, ...) -> per-blob feature vectors.

    One Arrow pass; the batch iterator shape is exactly what a real
    GPU/codec stage needs (amortized per-batch setup, bounded memory).
    ``use_stub=False`` runs the REAL decoders (PPM images / PCM16 WAV
    audio — pure Python+numpy, no external codec).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                nbytes.append(len(data))
                if use_stub:
                    feats.append(_fake_feature(data, dim).tolist())
                else:
                    feats.append(_real_feature(kind, data, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM payload (real P6 bytes)."""
    header = f"P6\n# kgp test\n{width} {height}\n255\n".encode()
    idx = np.arange(width * height * 3, dtype=np.int64)
    raster = ((idx * 31 + seed * 17) % 251).astype(np.uint8)
    return header + raster.tobytes()


def make_wav(n_samples: int, rate: int = 16000, channels: int = 1, seed: int = 0) -> bytes:
    """Deterministic canonical PCM16 WAVE payload (real RIFF bytes)."""
    idx = np.arange(n_samples * channels, dtype=np.int64)
    samples = (((idx * 127 + seed * 29) % 20001) - 10000).astype("<i2")
    data = samples.tobytes()
    byte_rate = rate * channels * 2
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the shuffle-free explode a real frame extractor consumes."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.integers(16, 256)))
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "content": bytearray(payload),
                "width": 64 if kind == "image" else None,
                "height": 64 if kind == "image" else None,
                "sample_rate": 16000 if kind == "audio" else None,
                "duration_ms": int(rng.integers(1000, 10000)) if kind == "video" else None,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
