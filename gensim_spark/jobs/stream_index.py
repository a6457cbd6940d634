#!/usr/bin/env python
"""Streaming ingestion job: watch a directory for new page parquet files and
maintain the incremental index store (counts + vocab Iceberg-semantics
tables), optionally compacting into weighted packed shards afterwards.

The north rule's "resumable from checkpoint" in streaming form: each
micro-batch commits an atomic counts APPEND + vocab OVERWRITE snapshot pair
with the batch id in the snapshot summary (exactly-once across stream
restarts — streaming/incremental.py:77-101); the Structured Streaming
checkpoint carries the source offsets. Compaction rebuilds BM25-weighted
packed shards from all committed counts while readers time-travel on the
previous snapshots (``Similarity.add_documents``/``reopen_shard`` semantics,
gensim/similarities/docsim.py:367-478, as a streaming warehouse split).

Run: spark-submit --py-files gensim_spark.zip gensim_spark/jobs/stream_index.py \
       --input /landing/pages --store /idx/store --checkpoint /idx/ckpt \
       [--compact-to /idx/shards] [--from-html]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

PAGES_DDL = ("url string, warc_ts timestamp, html binary, text string,"
             " lang string")


def run(spark, input_dir: str, store_dir: str, checkpoint_dir: str,
        compact_to: str | None = None, from_html: bool = False,
        variant: str = "okapi", schema: str = PAGES_DDL,
        max_files_per_trigger: int | None = None) -> dict:
    """The job body (availableNow trigger: drain everything currently in
    ``input_dir``, then stop — re-running picks up only new files via the
    checkpoint). Returns ingest + store metrics."""
    from pyspark.sql import functions as F

    from gensim_spark.streaming import incremental as I

    t0 = time.perf_counter()
    # landing dirs commonly nest one parquet dir per arrival batch
    reader = spark.readStream.schema(schema) \
        .option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)
    if "doc_id" not in pages.columns:
        # stable across batches/restarts: id = hash(url). 64-bit space is
        # the practical ceiling here; at 10^12 docs expect ~1e4 collisions —
        # a composite (url, warc_ts) key table is the exact-identity path.
        pages = pages.withColumn("doc_id", F.xxhash64("url"))
    html_col = "html" if from_html else "text"
    q = I.start_incremental_build(spark, pages, store_dir, checkpoint_dir,
                                  html_col=html_col)
    q.awaitTermination()

    ct, vt = I.counts_table(store_dir), I.vocab_table(store_dir)
    batches = [s.summary.get("batch_id") for s in ct.snapshots
               if "batch_id" in s.summary]
    metrics = {
        "batches_committed": len(batches),
        "counts_snapshots": len(ct.snapshots),
        "vocab_terms": int(vt.current_snapshot.summary
                           .get("total-records", 0))
        if vt.current_snapshot else 0,
        "ingest_sec": round(time.perf_counter() - t0, 3),
    }
    if compact_to is not None:
        t1 = time.perf_counter()
        table = I.compact(spark, store_dir, compact_to, variant=variant)
        metrics["compact_sec"] = round(time.perf_counter() - t1, 3)
        metrics["shard_snapshots"] = len(table.snapshots)
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory of page parquet files to watch")
    ap.add_argument("--store", required=True,
                    help="incremental store dir (counts + vocab tables)")
    ap.add_argument("--checkpoint", required=True,
                    help="Structured Streaming checkpoint dir")
    ap.add_argument("--compact-to", default=None,
                    help="also rebuild weighted packed shards here")
    ap.add_argument("--variant", default="okapi",
                    choices=["okapi", "lucene", "atire"])
    ap.add_argument("--from-html", action="store_true",
                    help="extract text from the html column")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    args = ap.parse_args()

    from gensim_spark.session import get_spark

    spark = get_spark("gensim_spark_stream_index")
    metrics = run(spark, args.input, args.store, args.checkpoint,
                  compact_to=args.compact_to, from_html=args.from_html,
                  variant=args.variant,
                  max_files_per_trigger=args.max_files_per_trigger)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
