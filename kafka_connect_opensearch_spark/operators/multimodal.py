"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shape, partition-preserving
``mapInPandas``) is real and tested; the actual media decode is stubbed
behind ``NotImplementedError`` or a deterministic fake, because no
image/audio libraries exist in this container. Swap ``_decode_image_real``
for a PIL/libvips call on a real cluster and nothing else changes.

Design rules for 100 TB of media:
- binary payloads travel in their own column so column pruning keeps them
  out of every query that doesn't touch pixels;
- feature extraction is ``mapInPandas`` (per-partition Arrow batches) —
  decode amortizes across a batch, memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- outputs are fixed-size arrays/structs, never re-encoded blobs, so
  downstream joins/aggs stay columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = "media_id long, feat array<float>, feat_dim int"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha string"

STUB_FEATURE_DIM = 16


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decoder hook — not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips; not installed in this sandbox"
    )


def _fake_decode_features(payload: bytes, dim: int = STUB_FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'embedding': bytes of sha256(payload) scaled to
    [0,1). Stands in for a decode+CNN step; stable across runs/executors.

    Scaling by 256 (not 255) keeps every value an exact dyadic rational —
    bit-identical in float32, float64, and any SQL engine's DOUBLE, which
    is what lets the DuckDB oracle recompute feature sums exactly."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim // len(h)) + 1))[:dim], dtype=np.uint8)
    return raw.astype(np.float32) / 256.0


def extract_image_features(
    df: DataFrame, use_stub: bool = True, dim: int = STUB_FEATURE_DIM
) -> DataFrame:
    """payload binary → fixed-dim float features via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                (
                    _fake_decode_features(p, dim)
                    if use_stub
                    else _decode_image_real(p)
                ).tolist()
                for p in b["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "feat": feats,
                    "feat_dim": dim,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, use_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Stub derives per-frame identity from sha256(payload || frame_idx); a
    real implementation would seek/decode. Output cardinality and schema
    (the part Spark cares about) are identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, shas = [], [], []
            for mid, payload, dur in zip(
                b["media_id"], b["payload"], b["duration_ms"], strict=True
            ):
                if not use_stub:
                    raise NotImplementedError("video decode not available")
                n_frames = max(1, int(dur or 0) // every_ms)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            bytes(payload) + f":{i}".encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return df.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests (binary payload column).

    Payload bytes are ASCII (hex text) so an independent SQL oracle can
    recompute sha256 over them; the engine still treats the column as
    opaque ``binary``."""
    rows = []
    for i in range(n):
        payload = (
            hashlib.sha256(f"media{i}".encode()).hexdigest() * (i % 5 + 1)
        ).encode()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    kind
                ],
                64 + i,
                48 + i,
                (i % 3 == 2) and 3500 + i * 100 or 0,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata aggregation proving binary columns stay pruned away:
    byte sizes and counts per kind (scan never materializes pixels in
    Python)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg("width").alias("avg_width"),
        )
        .orderBy("kind")
    )
