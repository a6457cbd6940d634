"""BM25 weighting (Okapi / Lucene / Atire) as DataFrame plans.

Reference semantics (gensim/models/bm25model.py, natural logs throughout):

- fit-from-dictionary: ``avgdl = Σ cfs / num_docs`` (positions per doc,
  bm25model.py:61-62); fit-from-corpus: ``avgdl = Σ len(bow) / num_docs``
  (distinct terms per doc — the documented quirk, bm25model.py:64-74;
  SURVEY.md §7.0 item 1). Both paths are implemented.
- Okapi idf: ``ln(N − df + 0.5) − ln(df + 0.5)``; negatives are replaced by
  ``ε · mean(idf over ALL terms, negatives included)`` — a global two-pass
  (bm25model.py:216-232). Defaults k1=1.5, b=0.75, ε=0.25.
- Lucene idf: ``ln(N + 1) − ln(df + 0.5)``; weight has no (k1+1) numerator
  factor (bm25model.py:241-315). Atire idf: ``ln(N) − ln(df)``
  (bm25model.py:318-391).
- Per-doc weight: ``idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
  ``dl = Σ tf`` of the doc's in-vocab tokens (bm25model.py:119-140, 234-238).
- Unknown terms at scoring time: ``idfs.get(term) or 0.0`` — note Python
  ``or`` also maps a legitimate 0.0 idf to 0.0 (bm25model.py:130); replicated
  by treating idf==0.0 and missing identically (coalesce to 0.0).

Scale: the fit is two aggregations over the vocab table (tiny); weighting is a
narrow join of postings against broadcast idf + shuffled doclens. At 10^12 docs
the doclen join shuffles on doc_id — both sides can be pre-bucketed by doc_id
to make it co-located (the index build in ``gensim_spark.index`` does exactly
that).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensim_spark.operators.bow import doclens

OKAPI, LUCENE, ATIRE = "okapi", "lucene", "atire"


@dataclass
class BM25Stats:
    """Fitted model: broadcastable idf table + scalars."""

    variant: str
    k1: float
    b: float
    epsilon: float
    avgdl: float
    num_docs: int
    idfs: DataFrame  # (term_id, idf)


def _raw_idf_col(variant: str, num_docs: int):
    n = F.lit(float(num_docs))
    df = F.col("df").cast("double")
    if variant == OKAPI:
        return F.log(n - df + F.lit(0.5)) - F.log(df + F.lit(0.5))
    if variant == LUCENE:
        return F.log(n + F.lit(1.0)) - F.log(df + F.lit(0.5))
    if variant == ATIRE:
        return F.log(n) - F.log(df)
    raise ValueError(f"unknown BM25 variant {variant!r}")


def idf_table(dfs: DataFrame, num_docs: int, variant: str = OKAPI,
              epsilon: float = 0.25) -> DataFrame:
    """dfs(term_id, df) → (term_id, idf) with the Okapi ε-clamp.

    The clamp is a global two-pass: mean over ALL raw idfs first (negatives
    included), then replace negatives with ε·mean (bm25model.py:216-232).
    Implemented as an agg + cross-join of a 1-row literal — Catalyst plans the
    scalar as a broadcast, so this stays two stages at any vocab size.
    """
    raw = dfs.withColumn("_raw_idf", _raw_idf_col(variant, num_docs))
    if variant != OKAPI:
        return raw.select("term_id", F.col("_raw_idf").alias("idf"))
    avg_idf = raw.agg(F.avg("_raw_idf").alias("_avg_idf"))
    return raw.crossJoin(F.broadcast(avg_idf)).select(
        "term_id",
        F.when(
            F.col("_raw_idf") < 0, F.lit(epsilon) * F.col("_avg_idf")
        ).otherwise(F.col("_raw_idf")).alias("idf"),
    )


def fit_from_vocab(vocab: DataFrame, num_docs: int, variant: str = OKAPI,
                   k1: float = 1.5, b: float = 0.75,
                   epsilon: float = 0.25) -> BM25Stats:
    """Dictionary fit path: avgdl = Σcf/num_docs (bm25model.py:61-62)."""
    total_cf = vocab.agg(F.sum("cf").alias("s")).collect()[0]["s"] or 0
    return BM25Stats(
        variant=variant, k1=k1, b=b, epsilon=epsilon,
        avgdl=total_cf / num_docs, num_docs=num_docs,
        idfs=idf_table(vocab.select("term_id", "df"), num_docs, variant, epsilon),
    )


def fit_from_postings(postings: DataFrame, variant: str = OKAPI, k1: float = 1.5,
                      b: float = 0.75, epsilon: float = 0.25) -> BM25Stats:
    """Corpus fit path: avgdl = avg *distinct terms* per doc = nnz/num_docs
    (the reference quirk, bm25model.py:64-74); dfs recomputed from postings."""
    g = postings.agg(
        F.count(F.lit(1)).alias("nnz"), F.countDistinct("doc_id").alias("nd")
    ).collect()[0]
    num_docs = g["nd"]
    dfs = postings.groupBy("term_id").agg(F.count(F.lit(1)).alias("df"))
    return BM25Stats(
        variant=variant, k1=k1, b=b, epsilon=epsilon,
        avgdl=g["nnz"] / num_docs, num_docs=num_docs,
        idfs=idf_table(dfs, num_docs, variant, epsilon),
    )


def _weight_col(variant: str, k1: float, b: float, avgdl: float):
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    num = tf * F.lit(k1 + 1.0) if variant in (OKAPI, ATIRE) else tf
    return F.col("idf") * (num / denom)


def weight_postings(postings: DataFrame, stats: BM25Stats,
                    dl: DataFrame | str | None = None) -> DataFrame:
    """postings(doc_id, term_id, tf) → weighted (doc_id, term_id, weight).

    dl: None → computed and joined on doc_id; a DataFrame → joined; the string
    ``"inline"`` → postings already carry a ``dl`` column (window-computed,
    saves the join shuffle — the pipeline's default). idf join is broadcast.
    Missing idf coalesces to 0.0 — together with the ``or 0.0`` quirk this
    means idf==0 terms contribute 0 (bm25model.py:130).
    """
    if dl is None:
        dl = doclens(postings)
    joined = postings if isinstance(dl, str) else postings.join(dl, "doc_id")
    return (
        joined
        .join(F.broadcast(stats.idfs), "term_id", "left")
        .withColumn("idf", F.coalesce(F.col("idf"), F.lit(0.0)))
        .select(
            "doc_id", "term_id",
            _weight_col(stats.variant, stats.k1, stats.b, stats.avgdl)
            .alias("weight"),
        )
    )
