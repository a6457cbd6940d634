"""Corpus wrapper utilities — ClippedCorpus / SlicedCorpus /
RepeatCorpusNTimes / RepeatCorpus (reference gensim/utils.py:994-1134) as
DataFrame plans over (doc_id, ...) rows.

The reference wraps python iterators (itertools.islice / cycle); a
DataFrame subsumes the streaming concern, so these reduce to plans:

* a clip is a semi-join against a TakeOrdered id list — the payload table
  is never globally sorted, only the 1-column id projection flows through
  the limit;
* a slice is a positional filter over a zipWithIndex rank computed on the
  id projection (never a row_number window over the payload — that would
  funnel the table through one task);
* the repeats are one crossJoin with a broadcast ``spark.range(n)`` —
  n-way duplication in a single narrow plan, no n-fold union tree.

Document ORDER is the engine's canonical ``doc_id`` ascending (the
reference's arrival order); the repeat operators expose the cycle number
as a ``rep`` column, so (rep, doc_id) reproduces the reference's emission
order exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(df: DataFrame, doc_col: str) -> DataFrame:
    """(pos, doc_id) rows — 0-based rank in doc_id order, computed with
    zipWithIndex over the sorted 1-column projection (stable under AQE,
    unlike partition-id tricks)."""
    spark = df.sparkSession
    rdd = (df.select(doc_col).distinct()
           .orderBy(doc_col).rdd.zipWithIndex()
           .map(lambda ri: (ri[1], ri[0][0])))
    return spark.createDataFrame(rdd, f"pos long, {doc_col} long")


def clipped_corpus(df: DataFrame, max_docs: int | None,
                   doc_col: str = "doc_id") -> DataFrame:
    """First ``max_docs`` documents in doc_id order (ClippedCorpus,
    utils.py:1062-1088); ``None`` = no limit."""
    if max_docs is None:
        return df
    ids = df.select(doc_col).distinct().orderBy(doc_col).limit(max_docs)
    return df.join(F.broadcast(ids), doc_col, "left_semi")


def sliced_corpus(df: DataFrame, slice_, doc_col: str = "doc_id"
                  ) -> DataFrame:
    """Positional slice in doc_id order (SlicedCorpus, utils.py:1090-1134):
    ``slice_`` is a python ``slice`` (non-negative fields, like the
    reference's islice fallback) or an iterable of positions (fancy
    indexing)."""
    pos = _positions(df, doc_col)
    if isinstance(slice_, slice):
        if any(x is not None and x < 0
               for x in (slice_.start, slice_.stop, slice_.step)):
            raise ValueError("negative slicing requires an indexable "
                             "corpus in the reference; use explicit "
                             "positions here")
        start = slice_.start or 0
        step = slice_.step or 1
        cond = (F.col("pos") >= start) & ((F.col("pos") - start) % step == 0)
        if slice_.stop is not None:
            cond &= F.col("pos") < slice_.stop
        keep = pos.filter(cond)
        # broadcast only a bounded keep-set: slice(10, None) keeps nearly
        # the whole corpus — shuffle semi-join there, never a corpus-sized
        # broadcast
        bounded = slice_.stop is not None
    else:
        keep = pos.filter(F.col("pos").isin([int(p) for p in slice_]))
        bounded = True
    keep = keep.select(doc_col)
    if bounded:
        keep = F.broadcast(keep)
    return df.join(keep, doc_col, "left_semi")


def repeat_corpus_n_times(df: DataFrame, n: int, doc_col: str = "doc_id",
                          rep_col: str = "rep") -> DataFrame:
    """The corpus repeated ``n`` whole times (RepeatCorpusNTimes,
    utils.py:1028-1059) — each copy tagged with its cycle number in
    ``rep_col``; (rep, doc_id) order == the reference's emission order."""
    spark = df.sparkSession
    reps = spark.range(n).select(F.col("id").alias(rep_col))
    return df.crossJoin(F.broadcast(reps))


def repeat_corpus(df: DataFrame, reps: int, doc_col: str = "doc_id",
                  rep_col: str = "rep") -> DataFrame:
    """Cycle the corpus until exactly ``reps`` documents (RepeatCorpus,
    utils.py:994-1025: islice(cycle(corpus), reps)) — full cycles via one
    broadcast range crossJoin plus a clipped partial cycle.

    Corpus length = distinct ``doc_col`` values (NOT the row count — a
    postings table carries many rows per document)."""
    n = df.select(doc_col).distinct().count()
    if n == 0 or reps <= 0:
        return repeat_corpus_n_times(df.limit(0), 1, doc_col, rep_col)
    full, rem = divmod(reps, n)
    out = repeat_corpus_n_times(df, full, doc_col, rep_col) if full else None
    if rem:
        tail = clipped_corpus(df, rem, doc_col) \
            .withColumn(rep_col, F.lit(full).cast("long"))
        out = tail if out is None else out.unionByName(tail)
    return out
