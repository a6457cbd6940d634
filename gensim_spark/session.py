"""SparkSession factory with scale-appropriate defaults.

Single place where engine-level configuration lives, so the same settings apply
to tests (local[*]), bench runs (local[$SPARK_GRAFT_CPUS]) and a real cluster
(spark-submit --py-files, where ``master`` is supplied externally).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gensim_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the inverted-index workload.

    Defaults chosen for scale:

    - AQE on: runtime coalescing of shuffle partitions and skew-join splitting
      matter when head terms dominate postings (webtext is zipfian).
    - Arrow enabled: every custom hook in this engine is a vectorized pandas UDF
      (no per-row Python anywhere in the hot path).
    - shuffle partitions default to 2x cores locally; on a real cluster leave
      unset and let AQE coalesce from a high initial number.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bounded Arrow batches: binary-heavy rows (html/media) at 10k rows
        # per batch would mean multi-hundred-MB allocations per task
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Broadcast threshold: vocab/idf tables for realistic vocabularies
        # (~10^6 terms * ~40B) fit comfortably; postings never broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode = single driver JVM doing all executor work: size the heap
        # for the core count or GC serializes every stage (observed: flat
        # scaling 8→32 cores at 8g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # finer input splits: more waves per stage → better balance under
        # noisy/contended cores; at cluster scale override upward.
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
