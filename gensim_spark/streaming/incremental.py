"""Incremental index maintenance with Structured Streaming.

Reference analogue: ``Similarity.add_documents`` buffer-and-spill
(gensim/similarities/docsim.py:367-416 — buffer until ``shardsize`` then
close a shard) and ``reopen_shard`` compaction (docsim.py:466-478). Here the
micro-batch IS the buffer: each batch of new pages is tokenized, counted,
appended to the postings store, and the vocabulary table is extended with
``merge_with`` semantics (same token keeps its id; new tokens get fresh
sequential ids — dictionary.py:532-591), which is exactly gensim's online
id assignment continued across batches.

Weighting note: BM25 idfs/avgdl are corpus-global, so incremental appends
update raw postings + vocab continuously while weighted shards are refreshed
by a periodic compaction job (recompute stats → re-weight changed shards) —
the same late-data/compaction split a streaming warehouse uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_incremental_build(spark: SparkSession, pages_stream: DataFrame,
                            store_dir: str,
                            checkpoint_dir: str,
                            html_col: str = "html"):
    """pages readStream → appends (doc_id, token, tf, dl) micro-batches to
    ``store_dir`/counts`` and maintains ``store_dir`/vocab`` across batches.

    Returns the StreamingQuery. Exactly-once: counts appends are tied to the
    stream checkpoint; vocab updates are idempotent (full overwrite per
    batch from counts-so-far would be exact but expensive — we extend
    incrementally with merge semantics and rebuild on compaction).
    """
    from gensim_spark.functions.textprep import extract_tokenize_bow

    counts_dir = f"{store_dir}/counts"
    vocab_dir = f"{store_dir}/vocab"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        counts = extract_tokenize_bow(batch_df, html_col=html_col)
        counts.persist()
        counts.write.mode("append").parquet(counts_dir)
        new_stats = counts.groupBy("token").agg(
            F.sum("tf").alias("cf"),
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("first_doc"),
        )
        try:
            old = s.read.parquet(vocab_dir)
            have_old = True
        except Exception:
            have_old = False
        if not have_old:
            from gensim_spark.operators.vocab import assign_term_ids

            vocab = assign_term_ids(new_stats, distributed=False).select(
                "token", "term_id", "df", "cf", "first_doc"
            )
        else:
            from pyspark.sql import Window

            base_n = old.count()
            joined = old.alias("a").join(new_stats.alias("b"), "token",
                                         "full_outer")
            kept = joined.filter(F.col("a.term_id").isNotNull()).select(
                "token", F.col("a.term_id").alias("term_id"),
                (F.coalesce(F.col("a.df"), F.lit(0))
                 + F.coalesce(F.col("b.df"), F.lit(0))).alias("df"),
                (F.coalesce(F.col("a.cf"), F.lit(0))
                 + F.coalesce(F.col("b.cf"), F.lit(0))).alias("cf"),
                F.col("a.first_doc").alias("first_doc"),
            )
            fresh = (
                joined.filter(F.col("a.term_id").isNull())
                .select("token", F.col("b.df").alias("df"),
                        F.col("b.cf").alias("cf"),
                        F.col("b.first_doc").alias("first_doc"))
                .withColumn(
                    "term_id",
                    F.lit(base_n)
                    + F.row_number().over(
                        Window.orderBy("first_doc", "token")
                    ) - F.lit(1),
                )
                .select("token", "term_id", "df", "cf", "first_doc")
            )
            vocab = kept.unionByName(fresh)
        vocab.write.mode("overwrite").parquet(vocab_dir + "_next")
        # atomic-ish swap: overwrite main dir from _next
        s.read.parquet(vocab_dir + "_next").write.mode("overwrite").parquet(
            vocab_dir
        )
        counts.unpersist()

    return (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact(spark: SparkSession, store_dir: str, index_dir: str,
            variant: str = "okapi") -> dict:
    """Periodic compaction: recompute corpus-global stats from all appended
    counts and rebuild weighted packed shards (the reopen_shard analogue)."""
    from gensim_spark.index.layout import write_packed_shards
    from gensim_spark.operators import bm25 as M

    counts = spark.read.parquet(f"{store_dir}/counts")
    vocab = spark.read.parquet(f"{store_dir}/vocab")
    num_docs = counts.select("doc_id").distinct().count()
    stats = M.fit_from_vocab(vocab, num_docs, variant=variant)
    with_ids = counts.join(
        F.broadcast(vocab.select("token", "term_id")), "token"
    ).select("doc_id", "term_id", "tf", "dl")
    weighted = M.weight_postings(with_ids, stats, dl="inline")
    return write_packed_shards(weighted, index_dir, resume=False)


def streaming_event_stats(events_stream: DataFrame,
                          watermark: str = "1 hour",
                          window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window rollup of an event stream — the
    late-data-tolerant aggregation surface (SURVEY.md §2.6 streaming note)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total")
    )
