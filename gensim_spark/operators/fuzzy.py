"""Fuzzy term matching: FastSS deletion-neighborhood kNN + Levenshtein
similarity.

Reference semantics:
- ``FastSS`` (gensim/similarities/fastss.pyx:1-211): index every term under
  all of its deletion variants (subsequences missing ≤ max_dist chars); two
  words within edit distance d share a variant when each deletes ≤ d chars —
  candidate retrieval is exact-match lookup, then a real edit-distance check.
  The deletion-variant structure is *join-friendly*: in Spark it is an
  explode + equi-join on the variant string (SURVEY.md §2.5).
- ``LevenshteinSimilarityIndex`` (gensim/similarities/levenshtein.py:24-105):
  ``levsim(t1,t2) = alpha · (1 − dist/max(len(t1),len(t2)))^beta`` with
  defaults alpha=1.8, beta=5.0, max_distance=2; top-n most similar dictionary
  terms per query term, the query term itself excluded.

Scale: the variant table is ~|vocab| · Σ C(len, d) rows — for max_dist 2 and
avg len 8 about 40 variants/term; the join is an equi-join on a short string
key, prunable by variant length. No pairwise scan over the vocabulary ever
happens.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType


def deletion_variants(word: str, max_dist: int) -> list[str]:
    """All subsequences of ``word`` missing 0..max_dist characters."""
    out = {word}
    n = len(word)
    for d in range(1, min(max_dist, n) + 1):
        for keep in combinations(range(n), n - d):
            out.add("".join(word[i] for i in keep))
    return sorted(out)


def edit_distance(a: str, b: str, band: int | None = None) -> int:
    """Levenshtein distance, optionally banded (early exit past ``band``)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if band is not None and lb - la > band:
        return band + 1
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        row_min = j
        for i in range(1, la + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (a[i - 1] != b[j - 1]))
            row_min = min(row_min, cur[i])
        if band is not None and row_min > band:
            return band + 1
        prev = cur
    return prev[la]


def levsim(t1: str, t2: str, distance: int, alpha: float = 1.8,
           beta: float = 5.0) -> float:
    """levenshtein.py:75-77."""
    max_len = max(len(t1), len(t2)) or 1
    return alpha * (1.0 - distance * 1.0 / max_len) ** beta


def _variants_udf(max_dist: int):
    @F.pandas_udf(ArrayType(StringType()))
    def udf(words: pd.Series) -> pd.Series:
        return words.map(lambda w: deletion_variants(w, max_dist))

    return udf


def build_fastss_index(vocab: DataFrame, max_dist: int = 2,
                       token_col: str = "token") -> DataFrame:
    """vocab → (variant, token): the deletion-neighborhood index table."""
    return vocab.select(
        F.col(token_col).alias("token"),
        F.explode(_variants_udf(max_dist)(F.col(token_col))).alias("variant"),
    ).select("variant", "token").distinct()


def most_similar_terms(spark: SparkSession, fastss_index: DataFrame,
                       query_words: list[str], topn: int = 10,
                       alpha: float = 1.8, beta: float = 5.0,
                       max_distance: int = 2) -> DataFrame:
    """(query, token, distance, similarity, rank): top-n dictionary terms per
    query word by Levenshtein similarity; the query word itself excluded.

    Plan: query variants (driver-side, queries are tiny) ⋈ index on variant →
    distinct candidates → banded edit-distance verify (Arrow batch) →
    levsim → per-query rank window.
    """
    qrows = [
        (w, v) for w in sorted(set(query_words))
        for v in deletion_variants(w, max_distance)
    ]
    qdf = spark.createDataFrame(qrows, "query string, variant string")
    cand = (
        fastss_index.join(F.broadcast(qdf), "variant")
        .select("query", "token")
        .distinct()
        .filter(F.col("query") != F.col("token"))
    )

    @F.pandas_udf(IntegerType())
    def dist_udf(q: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            [edit_distance(a, b, band=max_distance) for a, b in zip(q, t)]
        )

    verified = cand.withColumn("distance", dist_udf("query", "token")).filter(
        F.col("distance") <= max_distance
    )
    max_len = F.greatest(F.length("query"), F.length("token"), F.lit(1))
    sim = (
        F.lit(alpha)
        * F.pow(F.lit(1.0) - F.col("distance") / max_len, F.lit(beta))
    )
    w = Window.partitionBy("query").orderBy(
        F.col("similarity").desc(), F.col("token").asc()
    )
    return (
        verified.withColumn("similarity", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
    )
