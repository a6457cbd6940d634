"""Input-width guard for unsplittable small scans (optimization guide §2.5).

A parquet file with a single row group is one scan split no matter what
``spark.sql.files.maxPartitionBytes`` says — Spark cannot split inside a
row group — so every map-side stage over it (tokenize, regex scrubs,
per-row hashing, Arrow UDFs) runs as ONE task while the rest of the
cluster idles. Measured on this repo's bench tables (sf1.0
``documents.parquet``: 50k docs, one row group): the MinHash stage ran
11.4M md5s on one core — 12+ s for work that is ~0.5 s wide.

``widen_if_narrow(df)`` repartitions round-robin up to the session's
default parallelism, but ONLY when the frame's current partitioning is
narrower — on a real corpus (thousands of input splits) it is a no-op, so
this is scale-adaptive, not a local-mode constant. Round-robin
repartition is deterministic under retries (Spark sorts before
round-robin, SPARK-23207) and only redistributes rows, so every
row-keyed/aggregated result is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` (default: the session's
    ``sc.defaultParallelism``) iff it currently has fewer partitions."""
    sc = df.sparkSession.sparkContext
    n_target = int(target) if target else sc.defaultParallelism
    try:
        n_now = df.rdd.getNumPartitions()
    except Exception:
        return df
    if 0 < n_now < n_target:
        return df.repartition(n_target)
    return df
