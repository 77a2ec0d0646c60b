"""Multimodal (image/audio/video) column plumbing.

The crawl records media as opaque ``binary`` columns with typed metadata
(the reference stores image BLOBs the same way, reference
db/migrations/012425_init.sql:20-29 / src/sqlite.rs:33-39). This module
provides the Spark-side operators a training-data pipeline needs over such
columns — schema, partition-friendly batch shape, Arrow-batched UDF
signatures — with the actual codec work STUBBED: no image/audio libraries
exist in this environment, so ``decode`` produces a deterministic fake
derived from the bytes (sha1-seeded), clearly marked. Swapping the stub for
PIL/ffmpeg changes one function body; every signature, schema and
``mapInPandas`` batch contract stays as-is.

Operators:
- ``media_schema``         canonical media-table schema
- ``decode_meta``          binary -> (width, height, n_frames, duration_ms)
- ``image_features``       binary -> fixed-dim float vector (fake embedding)
- ``resize_images``        binary -> binary (stub: tagged passthrough)
- ``sample_frames``        video binary -> exploded frame rows (stub bytes)

All operators run via ``mapInPandas`` so each partition streams
Arrow batches without materializing the full binary column per row group.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, source_url string, "
    "content_type string"
)

FEATURE_DIM = 16


def _seed(b: bytes) -> np.random.Generator:
    h = hashlib.sha1(bytes(b or b"")).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def _fake_meta(b: bytes, kind: str) -> tuple[int, int, int, int]:
    """Deterministic fake decode: dimensions/frames derived from content
    hash. REPLACE with a real codec (PIL / soundfile / pyav) in production;
    the schema and batch shape are the contract."""
    rng = _seed(b)
    w = int(rng.integers(16, 4096))
    h = int(rng.integers(16, 4096))
    frames = int(rng.integers(1, 300)) if kind == "video" else 1
    duration = int(rng.integers(100, 600_000)) if kind in ("video", "audio") else 0
    return w, h, frames, duration


def decode_meta(df: DataFrame) -> DataFrame:
    """media -> typed metadata columns (one Arrow pass per partition)."""
    schema = (
        "media_id long, kind string, source_url string, width int, "
        "height int, n_frames int, duration_ms int, n_bytes long"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                _fake_meta(b, k)
                for b, k in zip(pdf["media"], pdf["kind"])
            ]
            arr = np.array(metas, dtype=np.int64).reshape(len(pdf), 4)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "source_url": pdf["source_url"],
                    "width": arr[:, 0].astype("int32"),
                    "height": arr[:, 1].astype("int32"),
                    "n_frames": arr[:, 2].astype("int32"),
                    "duration_ms": arr[:, 3].astype("int32"),
                    "n_bytes": pdf["media"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )

    return df.mapInPandas(op, schema=schema)


def image_features(df: DataFrame) -> DataFrame:
    """media -> fixed-dim float feature vector (fake embedding; the ANN
    operators in crabspark.queries consume exactly this shape)."""
    schema = f"media_id long, embedding array<float>"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _seed(b).random(FEATURE_DIM).astype(np.float32).tolist()
                for b in pdf["media"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": feats})

    return df.mapInPandas(op, schema=schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Stub resize: deterministic tagged passthrough (real impl: PIL
    thumbnail per batch). Keeps binary-in/binary-out shape."""
    schema = "media_id long, media binary, width int, height int"
    tag = f"RSZ{width}x{height}:".encode()

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media": [tag + bytes(b or b"") for b in pdf["media"]],
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return df.mapInPandas(op, schema=schema)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video -> frame rows (1->N inside mapInPandas; frame bytes are
    deterministic stubs). Real impl: pyav keyframe iteration per batch."""
    schema = "media_id long, frame_idx int, frame binary"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b, kind in zip(pdf["media_id"], pdf["media"], pdf["kind"]):
                if kind != "video":
                    continue
                _, _, n_frames, _ = _fake_meta(b, kind)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        hashlib.sha1(bytes(b or b"") + fi.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return df.mapInPandas(op, schema=schema)
