"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

The decode step itself is STUBBED — the sandbox has no image/audio
libraries — behind ``decoder=`` hooks: the default deterministic fake
decoder derives byte-level features (so tests pin real plumbing: schema,
batch shape, partitioning, null handling); passing ``strict=True``
raises NotImplementedError exactly where a real decoder (PIL/ffmpeg)
would plug in. Everything around the stub — the schema contract, the
Arrow batching, the fan-out of frame samples — is real Spark and tested.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, duration_ms long"
)
FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<float>"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def fake_decode_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for image/audio feature extraction: a
    byte-histogram projection. Replace with a real decoder in prod."""
    if payload is None:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * dim
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / arr.size).astype(np.float32).tolist()


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decoder: Callable[[bytes | None, int], list[float]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    ``strict=True`` marks the real-decoder integration point."""
    if strict:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not available in this "
            "environment; inject decoder= or use the deterministic fake"
        )
    decode = decoder or fake_decode_features

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["media"].map(lambda b: 0 if b is None else len(b)),
                    "feature": pdf["media"].map(lambda b: decode(b, dim)),
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: fans one row out to
    ceil(duration/every_ms) frame rows. The frame "decode" is a
    deterministic byte-slice stand-in; the fan-out/shape is the real
    contract a video pipeline needs."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for _, r in pdf.iterrows():
                if r["media_type"] != "video" or r["media"] is None:
                    continue
                n = max(1, int(r["duration_ms"] or 0) // every_ms)
                blob = bytes(r["media"])
                step = max(1, len(blob) // n)
                for i in range(n):
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_idx"].append(i)
                    rows["frame"].append(blob[i * step : (i + 1) * step])
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, FRAME_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/bench."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128 + (i % 5) * 64))
        rows.append((i, payload, mt, 64 if mt == "image" else None, 64 if mt == "image" else None, 4000 if mt == "video" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
