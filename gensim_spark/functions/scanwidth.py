"""Input-width guard for unsplittable small scans (optimization guide §2.5).

A parquet file with a single row group is one scan split no matter what
``spark.sql.files.maxPartitionBytes`` says — Spark cannot split inside a
row group — so every map-side stage over it (tokenize, regex scrubs,
per-row hashing, Arrow UDFs) runs as ONE task while the rest of the
cluster idles. Measured on this repo's bench tables (sf1.0
``documents.parquet``: 50k docs, one row group): the MinHash stage ran
11.4M md5s on one core — 12+ s for work that is ~0.5 s wide.

``widen_if_narrow(df, bytes_per_partition=...)`` repartitions round-robin
to a width PROPORTIONAL TO THE INPUT BYTES (summed over the scan's
files), capped at the session's default parallelism, and only when the
frame is currently narrower — so the target is derived from data volume,
never a core-count constant: a tiny input stays narrow (no exchange /
task-floor overhead — measured: a fixed defaultParallelism target cost
the sf0.1 suite ~15%), a single-file medium input fans out, and a real
multi-split corpus is untouched. ``bytes_per_partition`` encodes how
CPU-heavy the downstream work is per input byte (hashing/tokenize want
small chunks, light arithmetic wants larger). Round-robin repartition is
deterministic under retries (Spark sorts before round-robin,
SPARK-23207) and only redistributes rows, so every row-keyed/aggregated
result is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _input_bytes(df: DataFrame) -> int | None:
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        p = p[5:] if p.startswith("file:") else p
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def widen_if_narrow(df: DataFrame, target: int | None = None,
                    bytes_per_partition: int = 256 * 1024) -> DataFrame:
    """Round-robin repartition ``df`` up to
    ``min(defaultParallelism, input_bytes / bytes_per_partition)`` iff it
    currently has fewer partitions. An explicit ``target`` overrides the
    byte-derived one. No-op for streaming frames, frames with no file
    scan (in-memory test frames), or frames already at least that wide."""
    try:
        if df.isStreaming:  # no static partitioning to inspect
            return df
    except Exception:
        pass
    sc = df.sparkSession.sparkContext
    if target is None:
        total = _input_bytes(df)
        if total is None:
            return df
        target = min(sc.defaultParallelism,
                     max(1, total // int(bytes_per_partition)))
    n_target = int(target)
    try:
        n_now = df.rdd.getNumPartitions()
    except Exception:
        return df
    if 0 < n_now < n_target:
        return df.repartition(n_target)
    return df
