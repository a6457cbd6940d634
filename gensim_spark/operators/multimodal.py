"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with a metadata
struct; the Spark-side plumbing (schema, partition sizing, Arrow batch shape,
UDF signatures) is real and tested here, while the actual codecs are STUBBED
(image/audio libraries are not in this container): ``decode_image_batch``
raises ``NotImplementedError`` unless given the deterministic fake decoder,
which produces byte-derived pseudo-pixels so the downstream feature plumbing
is testable end-to-end.

Scale notes: media rows are large and variable — keep
``spark.sql.files.maxPartitionBytes`` small for media tables, and bound
Arrow batches via ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
batch of 10 MB blobs doesn't become a 1 GB Arrow allocation. Feature
extraction is ``mapInPandas`` (iterator form) so one task streams batches
instead of materializing its whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int,"
    " duration_ms long, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: folds the bytes into a
    fixed-size float vector (so tests exercise real plumbing end-to-end)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-arr.size) % dim
    folded = np.pad(arr, (0, pad)).reshape(-1, dim).astype(np.float32)
    return folded.mean(axis=0) / 255.0


def decode_image_batch(payloads: pd.Series, decoder=None) -> pd.Series:
    """payload bytes → decoded pixel array. STUB: pass ``decoder=fake_decode``
    (tests) or a real callable (PIL/libvips at deploy time)."""
    if decoder is None:
        raise NotImplementedError(
            "no image codec in this environment; inject decoder=fake_decode "
            "or a real decoder (e.g. PIL.Image.open) at deploy time"
        )
    return payloads.map(lambda p: decoder(bytes(p)) if p is not None else None)


def extract_features(media: DataFrame, decoder=fake_decode,
                     dim: int = 16) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature float[dim]) via one
    iterator-form mapInPandas stage (streams Arrow batches)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_image_batch(pd.Series([p]), decoder=decoder)[0].tolist()
                if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode itself is the stubbed stage). Demonstrates the explode shape:
    a 10-minute video at 1 fps → 600 rows, each a decode work item."""
    n_frames = F.greatest(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
            "payload",
        )
        .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests/bench)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 37 + j * 11) % 251) for j in range(64 + i))
        rows.append((i, kind, f"application/x-fake-{kind}", 8, 8,
                     1000 * (i % 7 + 1), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
