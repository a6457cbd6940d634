"""Additional corpus interchange formats: Blei LDA-C, SVMlight, GibbsLDA++.

Reference semantics (all yield/consume BoW, SURVEY.md §2.1):
- ``BleiCorpus`` (gensim/corpora/bleicorpus.py:22-180): one doc per line,
  ``N term:count term:count …`` with 0-based ids, plus a ``.vocab`` file of
  one token per line (line number = id).
- ``SvmLightCorpus`` (gensim/corpora/svmlightcorpus.py:22-185): one doc per
  line, ``target termid:weight …`` with **1-based** ids (0 reserved); gensim
  writes target 0 and ignores it on read (labels returned separately).
- ``LowCorpus`` (GibbsLDA++, gensim/corpora/lowcorpus.py:19-270): first line
  = number of docs, then one doc per line of space-separated *words*
  (positions, not counts).

These are interchange formats for corpus-sized data: readers are fully
distributed (doc ids from line positions via zipWithIndex); writers coalesce
to a single file like the reference.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def copen(path: str, mode: str = "rt"):
    """Codec-aware open: ``.gz``/``.bz2`` suffixes round-trip transparently,
    matching gensim's smart_open behavior on every corpus format
    (gensim/test/test_corpora.py compressed variants). Spark's text reader
    already decodes these on read; this covers the driver-side write/read
    halves."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, mode)
    if path.endswith(".bz2"):
        import bz2

        return bz2.open(path, mode)
    return open(path, mode)


def _lines_with_docno(spark: SparkSession, path: str,
                      skip_first: bool = False) -> DataFrame:
    lines = spark.read.text(path)
    rdd = lines.rdd.zipWithIndex().map(lambda ri: (ri[1], ri[0]["value"]))
    df = spark.createDataFrame(rdd, "lineno long, value string")
    if skip_first:
        df = df.filter(F.col("lineno") > 0).withColumn(
            "doc_id", F.col("lineno") - 1
        )
    else:
        df = df.withColumn("doc_id", F.col("lineno"))
    return df.select("doc_id", "value")


def _single_file(df: DataFrame, path: str, header: str | None = None) -> None:
    tmp = path + ".parts"
    df.coalesce(1).write.mode("overwrite").text(tmp)
    part = next(p for p in sorted(os.listdir(tmp)) if p.startswith("part-"))
    with copen(path, "wt") as out:
        if header is not None:
            out.write(header + "\n")
        with open(os.path.join(tmp, part)) as f:
            out.write(f.read())
    shutil.rmtree(tmp)


# --- Blei LDA-C --------------------------------------------------------------

def read_blei(spark: SparkSession, path: str) -> DataFrame:
    """→ postings (doc_id, term_id, tf)."""
    docs = _lines_with_docno(spark, path)
    pairs = docs.select(
        "doc_id",
        F.explode(F.slice(F.split(F.trim("value"), r"\s+"), 2, 10**9))
        .alias("pair"),
    )
    kv = F.split(F.col("pair"), ":")
    return pairs.select(
        "doc_id",
        kv.getItem(0).cast("long").alias("term_id"),
        kv.getItem(1).cast("long").alias("tf"),
    )


def write_blei(postings: DataFrame, path: str,
               vocab: DataFrame | None = None) -> None:
    """postings (doc_id, term_id, tf) → LDA-C file (+ ``.vocab`` if vocab
    given). Terms sorted by id within each doc line (bleicorpus semantics)."""
    lines = (
        postings.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array_sort(F.collect_list(F.struct("term_id", "tf"))).alias("b"),
        )
        .orderBy("doc_id")
        .select(
            F.concat_ws(
                " ",
                F.col("n").cast("string"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.col("b"),
                        lambda s: F.concat_ws(
                            ":", s["term_id"].cast("string"),
                            s["tf"].cast("string")
                        ),
                    ),
                ),
            ).alias("value")
        )
    )
    _single_file(lines, path)
    if vocab is not None:
        _single_file(
            vocab.orderBy("term_id").select(F.col("token").alias("value")),
            path + ".vocab",
        )


# --- SVMlight ----------------------------------------------------------------

def read_svmlight(spark: SparkSession, path: str) -> DataFrame:
    """→ (doc_id, term_id, weight, label) — ids converted to 0-based."""
    docs = _lines_with_docno(spark, path)
    docs = docs.filter(~F.col("value").startswith("#")
                       & (F.length(F.trim("value")) > 0))
    parts = F.split(F.trim("value"), r"\s+")
    base = docs.select(
        "doc_id",
        parts.getItem(0).cast("double").alias("label"),
        F.explode(F.slice(parts, 2, 10**9)).alias("pair"),
    )
    kv = F.split(F.col("pair"), ":")
    return base.select(
        "doc_id",
        (kv.getItem(0).cast("long") - 1).alias("term_id"),
        kv.getItem(1).cast("double").alias("weight"),
        "label",
    )


def write_svmlight(postings: DataFrame, path: str,
                   weight_col: str = "tf", labels: DataFrame | None = None) -> None:
    """postings → SVMlight lines ``label termid+1:weight …`` (gensim writes
    label 0 when none given, svmlightcorpus.py)."""
    base = postings.select(
        "doc_id", "term_id", F.col(weight_col).cast("double").alias("w")
    )
    if labels is not None:
        base = base.join(labels, "doc_id", "left").withColumn(
            "label", F.coalesce(F.col("label"), F.lit(0)).cast("long")
        )
    else:
        base = base.withColumn("label", F.lit(0))
    lines = (
        base.groupBy("doc_id", "label")
        .agg(F.array_sort(F.collect_list(F.struct("term_id", "w"))).alias("b"))
        .orderBy("doc_id")
        .select(
            F.concat_ws(
                " ",
                F.col("label").cast("string"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.col("b"),
                        lambda s: F.concat_ws(
                            ":", (s["term_id"] + 1).cast("string"),
                            F.format_string("%.12g", s["w"]),
                        ),
                    ),
                ),
            ).alias("value")
        )
    )
    _single_file(lines, path)


# --- Mallet (gensim/corpora/malletcorpus.py:19-215) --------------------------

def read_mallet(spark: SparkSession, path: str) -> DataFrame:
    """Each line ``docid lang word word …`` → (doc_id, mallet_id, lang,
    tokens). doc_id is the line position (gensim's docno); mallet_id is the
    file's own first field (returned as metadata, malletcorpus line2doc)."""
    docs = _lines_with_docno(spark, path)
    parts = F.split(F.trim("value"), r"\s+")
    return docs.select(
        "doc_id",
        parts.getItem(0).alias("mallet_id"),
        parts.getItem(1).alias("lang"),
        F.slice(parts, 3, 10**9).alias("tokens"),
    )


def write_mallet(docs: DataFrame, path: str, tokens_col: str = "tokens",
                 lang: str = "__unknown__") -> None:
    """gensim writes ``docno __unknown__ tokens…`` when no metadata given."""
    lines = docs.orderBy("doc_id").select(
        F.concat_ws(
            " ", F.col("doc_id").cast("string"), F.lit(lang),
            F.concat_ws(" ", F.col(tokens_col)),
        ).alias("value")
    )
    _single_file(lines, path)


# --- UCI BoW (gensim/corpora/ucicorpus.py:24-280) ----------------------------

def read_uci(spark: SparkSession, path: str) -> DataFrame:
    """3 header lines (num_docs/num_terms/num_nnz) then 1-based
    ``docID wordID count`` triples → postings (doc_id, term_id, tf)."""
    docs = _lines_with_docno(spark, path)
    body = docs.filter(F.col("doc_id") >= 3)
    parts = F.split(F.trim("value"), r"\s+")
    return body.select(
        (parts.getItem(0).cast("long") - 1).alias("doc_id"),
        (parts.getItem(1).cast("long") - 1).alias("term_id"),
        parts.getItem(2).cast("long").alias("tf"),
    )


def uci_stats(spark: SparkSession, path: str) -> tuple[int, int, int]:
    with copen(path) as f:
        return int(f.readline()), int(f.readline()), int(f.readline())


def write_uci(postings: DataFrame, path: str,
              vocab: DataFrame | None = None) -> None:
    stats = postings.agg(
        (F.max("doc_id") + 1).alias("nd"), (F.max("term_id") + 1).alias("nt"),
        F.count(F.lit(1)).alias("nnz"),
    ).collect()[0]
    lines = (
        postings.orderBy("doc_id", "term_id")
        .select(F.concat_ws(
            " ", (F.col("doc_id") + 1).cast("string"),
            (F.col("term_id") + 1).cast("string"),
            F.col("tf").cast("string"),
        ).alias("value"))
    )
    header = f"{int(stats['nd'] or 0)}\n{int(stats['nt'] or 0)}\n{stats['nnz']}"
    _single_file(lines, path, header=header)
    if vocab is not None:
        _single_file(
            vocab.orderBy("term_id").select(F.col("token").alias("value")),
            path + ".vocab",
        )


# --- CSV corpus (gensim/corpora/csvcorpus.py:21-76) --------------------------

def read_csv_corpus(spark: SparkSession, path: str,
                    header: bool = False) -> DataFrame:
    """Each row = dense vector of numeric fields → postings
    (doc_id, term_id, weight); doc ids from line order, term ids from column
    position (CsvCorpus yields dense rows as BoW)."""
    df = spark.read.option("header", "false").csv(path)
    rdd = df.rdd.zipWithIndex().map(
        lambda ri: (ri[1], [ri[0][c] for c in range(len(ri[0]))])
    )
    wide = spark.createDataFrame(rdd, "doc_id long, vals array<string>")
    if header:
        wide = wide.filter(F.col("doc_id") > 0).withColumn(
            "doc_id", F.col("doc_id") - 1
        )
    return wide.select(
        "doc_id",
        F.posexplode("vals").alias("term_id", "w"),
    ).select(
        "doc_id", F.col("term_id").cast("long").alias("term_id"),
        F.col("w").cast("double").alias("weight"),
    ).filter(F.col("weight").isNotNull())


# --- GibbsLDA++ LOW ----------------------------------------------------------

def read_low(spark: SparkSession, path: str) -> DataFrame:
    """→ (doc_id, tokens array<string>); first line is the doc count."""
    docs = _lines_with_docno(spark, path, skip_first=True)
    return docs.select(
        "doc_id", F.split(F.trim("value"), r"\s+").alias("tokens")
    )


def write_low(docs: DataFrame, path: str, tokens_col: str = "tokens") -> None:
    n = docs.count()
    lines = docs.orderBy("doc_id").select(
        F.concat_ws(" ", F.col(tokens_col)).alias("value")
    )
    _single_file(lines, path, header=str(n))
