"""BoW representation converters (gensim/matutils.py:243-628 family).

gensim converts between sparse BoW lists, dense vectors, scipy matrices and
corpora (``any2sparse``, ``sparse2full``, ``full2sparse``, ``corpus2dense``,
``corpus2csc``, ``Dense2Corpus``, ``Sparse2Corpus``). The Spark-native
equivalents convert between the three layouts this engine uses:

- **postings** (long form): (doc_id, term_id, weight) — the canonical IR;
- **bow rows**: (doc_id, bow array<struct<term_id, weight>>) sorted by id;
- **dense rows**: (doc_id, vec array<double>) of length num_terms.

All are narrow per-doc transformations (explode / collect+sort / scatter into
a fixed-length array) — no shuffle beyond the groupBy(doc_id) for row forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def postings_to_bow(postings: DataFrame, weight_col: str = "weight") -> DataFrame:
    """long form → (doc_id, bow) with entries sorted by term_id ascending
    (the gensim BoW ordering invariant, dictionary.py:268)."""
    return postings.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("term_id", F.col(weight_col).alias("weight")))
        ).alias("bow")
    )


def bow_to_postings(bow_df: DataFrame) -> DataFrame:
    """(doc_id, bow array<struct<term_id, weight>>) → long form."""
    return bow_df.select(
        "doc_id", F.explode("bow").alias("e")
    ).select("doc_id", F.col("e.term_id").alias("term_id"),
             F.col("e.weight").alias("weight"))


def sparse2full(postings: DataFrame, num_terms: int,
                weight_col: str = "weight") -> DataFrame:
    """long form → dense rows: (doc_id, vec array<double>[num_terms]), zeros
    for absent terms (matutils.sparse2full / corpus2dense)."""
    bow = postings_to_bow(postings, weight_col)
    # scatter: for each position i take the bow entry with term_id == i if any
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(num_terms - 1)),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_entries(
                    F.transform(
                        F.col("bow"),
                        lambda e: F.struct(e["term_id"].alias("k"),
                                           e["weight"].cast("double").alias("v")),
                    )
                ),
                i.cast("long"),
            ),
            F.lit(0.0),
        ),
    )
    return bow.select("doc_id", vec.alias("vec"))


def full2sparse(dense: DataFrame, eps: float = 1e-9,
                vec_col: str = "vec") -> DataFrame:
    """dense rows → long form, dropping |w| < eps (matutils.full2sparse)."""
    return (
        dense.select(
            "doc_id", F.posexplode(vec_col).alias("term_id", "weight")
        )
        .filter(F.abs(F.col("weight")) >= eps)
        .select("doc_id", F.col("term_id").cast("long").alias("term_id"),
                "weight")
    )


def full2sparse_clipped(dense: DataFrame, topn: int, eps: float = 1e-9,
                        vec_col: str = "vec") -> DataFrame:
    """Per-doc top-n by |weight| (matutils.full2sparse_clipped:435-468):
    ties broken by ascending term position, exact zeros/eps dropped."""
    from pyspark.sql import Window

    sparse = full2sparse(dense, eps, vec_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.abs(F.col("weight")).desc(), F.col("term_id").asc()
    )
    return (
        sparse.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= topn)
        .drop("_r")
    )
