"""Text corpus sources + vocabulary TSV persistence.

Reference semantics:
- ``TextCorpus`` (gensim/corpora/textcorpus.py:57-394): line-per-document
  text with a preprocessing pipeline (char filters → tokenizer → token
  filters), default pipeline = lower → deaccent → simple_tokenize →
  remove_stopwords → remove_short (textcorpus.py:101-108).
- ``TextDirectoryCorpus`` (textcorpus.py:396-547): recursive directory walk.
- ``Dictionary.save_as_text`` / ``load_from_text``
  (gensim/corpora/dictionary.py:472-530, 639-693): TSV ``id\\ttoken\\tdf``
  with a ``num_docs`` header line, sorted ids.
- JSON-lines sink mirrors ``segment_wiki``'s output shape
  (gensim/scripts/segment_wiki.py:75-).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


@F.pandas_udf(ArrayType(StringType()))
def _default_pipeline_udf(text: pd.Series) -> pd.Series:
    """TextCorpus default pipeline (textcorpus.py:101-108): lower, deaccent,
    simple_tokenize, remove stopwords, drop len<3 tokens."""
    from gensim_spark.functions import textref

    def run(t):
        if t is None:
            return None
        toks = list(textref.tokenize(t, lowercase=True, deacc=True,
                                     errors="ignore"))
        toks = textref.remove_stopword_tokens(toks)
        return textref.remove_short_tokens(toks, 3)

    return text.map(run)


def read_text_corpus(spark: SparkSession, path: str,
                     pipeline: str = "default") -> DataFrame:
    """Line-per-document text → (doc_id, text, tokens). doc_id is the
    0-based line position in file order (gensim's docno), computed
    distributedly via zipWithIndex."""
    lines = spark.read.text(path).select(F.col("value").alias("text"))
    rdd = lines.rdd.zipWithIndex().map(lambda ri: (ri[1], ri[0]["text"]))
    docs = spark.createDataFrame(rdd, "doc_id long, text string")
    tok = (
        _default_pipeline_udf(F.col("text")) if pipeline == "default"
        else None
    )
    if tok is None:
        from gensim_spark.functions.textprep import simple_preprocess_udf

        tok = simple_preprocess_udf(F.col("text"))
    return docs.withColumn("tokens", tok)


def read_text_directory(spark: SparkSession, root: str,
                        pattern: str | None = None,
                        exclude_pattern: str | None = None,
                        min_depth: int = 0,
                        max_depth: int | None = None) -> DataFrame:
    """Recursive directory of text files → (path, depth, doc_id, text,
    tokens); one document per file (TextDirectoryCorpus
    lines_are_documents=False, gensim/corpora/textcorpus.py:396-547).

    Filter semantics mirror ``iter_filepaths`` (textcorpus.py:509-528):
    depth 0 = files directly under ``root``; ``pattern`` /
    ``exclude_pattern`` are regexes MATCHED (anchored at the start, like
    ``re.match``) against the file NAME, not the path. doc_id is the rank in
    lexicographic path order (deterministic under distribution, unlike
    os.walk order)."""
    import os
    import re as _re

    df = (
        spark.read.format("text")
        .option("recursiveFileLookup", "true")
        .option("wholetext", "true")
        .load(root)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("text"),
        )
    )
    root_abs = os.path.abspath(root).strip("/")
    rel = F.regexp_replace(
        F.col("path"), "^file:/+" + _re.escape(root_abs) + "/", ""
    )
    df = df.withColumn("depth", F.size(F.split(rel, "/")) - 1).withColumn(
        "_name", F.substring_index(rel, "/", -1)
    )
    df = df.filter(F.col("depth") >= min_depth)
    if max_depth is not None:
        df = df.filter(F.col("depth") <= max_depth)
    if pattern:
        df = df.filter(F.col("_name").rlike("^(?:" + pattern + ")"))
    if exclude_pattern:
        df = df.filter(~F.col("_name").rlike("^(?:" + exclude_pattern + ")"))
    from pyspark.sql import Window

    df = df.withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("path")).cast("long") - 1,
    ).drop("_name")
    return df.withColumn("tokens", _default_pipeline_udf(F.col("text")))


def read_opinosis(spark: SparkSession, path: str) -> DataFrame:
    """Opinosis review dataset (gensim/corpora/opinosiscorpus.py:25-79):
    each file under ``<path>/summaries-gold/**`` is one document;
    preprocessing = ``re.findall(r'\\w+', doc.lower())`` → drop the frozen
    stopword set → Porter stem. Returns (doc_id, path, tokens); doc ids are
    the rank in lexicographic path order (the reference's os.walk order is
    fs-dependent; this one is deterministic under distribution). Compose
    with ``operators.vocab.build_vocab`` + ``operators.bow`` for the
    .corpus/.id2word surface."""
    import re as _re

    from pyspark.sql import Window

    from gensim_spark.functions.porter import porter_stem
    from gensim_spark.functions.stopwords import STOPWORDS

    @F.pandas_udf(ArrayType(StringType()))
    def prep(text: pd.Series) -> pd.Series:
        def run(t):
            if t is None:
                return None
            return [porter_stem(tok)
                    for tok in _re.findall(r"\w+", t.lower())
                    if tok not in STOPWORDS]

        return text.map(run)

    root = path.rstrip("/") + "/summaries-gold"
    df = (
        spark.read.format("text")
        .option("recursiveFileLookup", "true")
        .option("wholetext", "true")
        .load(root)
        .select(F.input_file_name().alias("path"),
                F.col("value").alias("text"))
        .withColumn("doc_id",
                    F.row_number().over(Window.orderBy("path")).cast("long")
                    - 1)
    )
    return df.select("doc_id", "path", prep(F.col("text")).alias("tokens"))


def save_vocab_as_text(vocab: DataFrame, path: str, num_docs: int) -> None:
    """Dictionary.save_as_text TSV: ``num_docs`` header then
    ``id<TAB>token<TAB>df`` sorted by id (dictionary.py:472-530)."""
    import os

    rows = (
        vocab.orderBy("term_id")
        .select(
            F.concat_ws(
                "\t", F.col("term_id").cast("string"), "token",
                F.col("df").cast("string")
            ).alias("value")
        )
    )
    from gensim_spark.sources.formats import copen

    tmp = path + ".parts"
    rows.coalesce(1).write.mode("overwrite").text(tmp)
    part = next(p for p in sorted(os.listdir(tmp)) if p.startswith("part-"))
    with copen(path, "wt") as out:
        out.write(f"{num_docs}\n")
        with open(os.path.join(tmp, part)) as f:
            out.write(f.read())
    import shutil

    shutil.rmtree(tmp)


def load_vocab_from_text(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Inverse of save_vocab_as_text → (vocab DF (token, term_id, df),
    num_docs)."""
    from gensim_spark.sources.formats import copen

    with copen(path) as f:
        num_docs = int(f.readline().strip())
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    vocab = (
        lines.filter(F.size(F.split(F.col("value"), "\t")) == 3)
        .select(
            parts.getItem(1).alias("token"),
            parts.getItem(0).cast("long").alias("term_id"),
            parts.getItem(2).cast("long").alias("df"),
        )
    )
    return vocab, num_docs


def write_jsonl(df: DataFrame, path: str) -> None:
    """segment_wiki-style JSON-lines sink (one JSON object per row)."""
    df.write.mode("overwrite").json(path)
