"""Matrix Market corpus source/sink (gensim's canonical interchange format).

Reference semantics (``MmReader``/``MmWriter``, gensim/corpora/_mmreader.pyx:
40-162, gensim/matutils.py:1145-1352):

- header line ``%%MatrixMarket matrix coordinate real general`` (+ optional
  ``%`` comment lines), then ``num_docs num_terms num_nnz``, then 1-based
  ``docno termno value`` triples, doc-major.
- the reader yields *implicit empty documents* for gaps in docno; the writer
  drops entries with |weight| ≤ 1e-12 and writes term ids sorted.
- gensim backpatches a fake header after streaming (matutils.py:1157-1160);
  Spark computes stats first (one count job) and writes once — no backpatch.

MM *is* the long/postings form, so the Spark reader maps lines straight to
the postings DataFrame (doc_id, term_id, weight) — 0-based like the reader
(docno-1, termno-1, _mmreader.pyx docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HEADER = "%%MatrixMarket matrix coordinate real general"


def read_mm(spark: SparkSession, path: str) -> DataFrame:
    """MM file(s) → postings DF (doc_id long, term_id long, weight double),
    0-based ids.

    The size line (``num_docs num_terms num_nnz``) has THREE tokens just like
    a data triple, so it cannot be told apart by token count. We drop it
    positionally instead: the first non-comment, non-blank line of each input
    file is the size line, always (MM spec). A window over
    ``input_file_name()`` ordered by the record's intra-file offset
    (monotonically_increasing_id is per-partition-monotonic, and text files
    are read in order within a split of the same file) marks it. One text
    file per MM corpus is the write_mm contract, so per-file rank 1 == size
    line even with multiple files globbed.
    """
    lines = spark.read.text(path).select(
        "value",
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_off"),
    )
    body = lines.filter(
        ~F.col("value").startswith("%")
        & (F.length(F.trim(F.col("value"))) > 0)
    )
    w = Window.partitionBy("_file").orderBy("_off")
    body = body.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") > 1
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    parsed = body.select(
        parts.getItem(0).cast("long").alias("a"),
        parts.getItem(1).cast("long").alias("b"),
        parts.getItem(2).cast("double").alias("w"),
    )
    triples = parsed.filter(F.col("w").isNotNull())
    return triples.select(
        (F.col("a") - 1).alias("doc_id"),
        (F.col("b") - 1).alias("term_id"),
        F.col("w").alias("weight"),
    )


def mm_stats(spark: SparkSession, path: str) -> tuple[int, int, int]:
    """(num_docs, num_terms, num_nnz) from the size line."""
    lines = spark.read.text(path)
    body = lines.filter(
        ~F.col("value").startswith("%")
        & (F.length(F.trim(F.col("value"))) > 0)
    )
    first = body.limit(1).collect()[0]["value"].split()
    return int(first[0]), int(first[1]), int(first[2])


def write_mm(postings: DataFrame, path: str, weight_col: str = "weight",
             eps: float = 1e-12) -> tuple[int, int, int]:
    """postings (doc_id, term_id, weight|tf) → a single MM file at ``path``.

    Stats come from one aggregation (no header backpatch); entries with
    |w| ≤ eps are dropped and output is sorted (doc_id, term_id) —
    matching MmWriter semantics. A ``.gz``/``.bz2`` suffix compresses the
    output (gensim reads/writes every format through smart_open codecs).
    Coalesces to one partition: MM is an interchange format for corpora
    that fit a file; the native sink for web-scale corpora is
    parquet/shards.
    """
    import os

    df = postings.select(
        "doc_id", "term_id", F.col(weight_col).cast("double").alias("w")
    ).filter(F.abs(F.col("w")) > eps)
    stats = df.agg(
        (F.max("doc_id") + 1).alias("nd"),
        (F.max("term_id") + 1).alias("nt"),
        F.count(F.lit(1)).alias("nnz"),
    ).collect()[0]
    nd, nt, nnz = int(stats["nd"] or 0), int(stats["nt"] or 0), int(stats["nnz"])
    body = (
        df.orderBy("doc_id", "term_id")
        .select(
            F.concat_ws(
                " ",
                (F.col("doc_id") + 1).cast("string"),
                (F.col("term_id") + 1).cast("string"),
                F.format_string("%.12g", F.col("w")),
            ).alias("value")
        )
    )
    from gensim_spark.sources.formats import copen

    tmp = path + ".parts"
    body.coalesce(1).write.mode("overwrite").text(tmp)
    part = next(p for p in sorted(os.listdir(tmp)) if p.startswith("part-"))
    with copen(path, "wt") as out:
        out.write(HEADER + "\n")
        out.write(f"{nd} {nt} {nnz}\n")
        with open(os.path.join(tmp, part)) as f:
            for line in f:
                out.write(line)
    import shutil

    shutil.rmtree(tmp)
    return nd, nt, nnz
