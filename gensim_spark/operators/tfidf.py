"""TF-IDF (SMART-IRS), log-entropy and vector-norm transformations.

Reference semantics (piskvorky/gensim):

- ``df2idf``: ``add + log_base(N/df)``, default base 2
  (gensim/models/tfidfmodel.py:105-126).
- SMART locals b/n/a/l/d/L (tfidfmodel.py:153-180): ``a`` and ``L`` need a
  per-document max/mean tf (window over doc_id). Globals n/f/t/p
  (tfidfmodel.py:183-208), all log2.
- Apply: ``wlocal(tf) · idf``; positions with ``|idf| ≤ eps`` (1e-12) are
  dropped *before* normalization (tfidfmodel.py:495-506).
- Normalization: 'c' = per-doc L2 unit; pivoted ('u'/'b' with pivot set):
  ``w / ((1 − slope)·pivot + slope·‖w‖₂)``, slope default 0.65
  (tfidfmodel.py:534-543); pivot auto = num_nnz/num_docs for 'u'
  (tfidfmodel.py:400-406).
- ``LogEntropyModel`` (gensim/models/logentropy_model.py:59-152): global pass
  ``p = tf/cf``, ``entropy(term) = 1 + Σ_docs p·log₂(p) / log₂(num_docs+1)``;
  apply ``log₂(tf+1) · entropy``, then L2 unit if normalize.
- ``unitvec``/``NormModel`` (gensim/matutils.py:699-793): l1/l2/'unique'
  norms; zero vectors unchanged (guarded by norm>0).

All of these are narrow joins + per-doc aggregations on the postings table —
the normalization "window" is implemented as groupBy+rejoin (shuffles once on
doc_id; identical partitioning to the doclen join so AQE reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOG2 = 0.6931471805599453  # ln(2)


def _log2(col):
    return F.log(col) / F.lit(LOG2)


def df2idf_col(df_col, num_docs: int, log_base: float = 2.0, add: float = 0.0):
    """idf = add + log_base(N / df) (tfidfmodel.py:105-126)."""
    import math

    return F.lit(add) + F.log(F.lit(float(num_docs)) / df_col.cast("double")) / F.lit(
        math.log(log_base)
    )


def smart_global_col(scheme: str, df_col, num_docs: int):
    n = F.lit(float(num_docs))
    df = df_col.cast("double")
    if scheme in ("n", "x"):
        return F.lit(1.0)
    if scheme == "f":
        return _log2(n / df)
    if scheme == "t":
        return _log2((n + F.lit(1.0)) / df)
    if scheme == "p":
        return F.greatest(F.lit(0.0), _log2((n - df) / df))
    raise ValueError(f"unknown global scheme {scheme!r}")


def _smart_local_expr(scheme: str, tf, doc_max_tf=None, doc_mean_tf=None):
    if scheme in ("n", "t"):
        return tf
    if scheme == "l":
        return F.lit(1.0) + _log2(tf)
    if scheme == "d":
        return F.lit(1.0) + _log2(F.lit(1.0) + _log2(tf))
    if scheme == "b":
        return F.when(tf != 0, F.lit(1.0)).otherwise(F.lit(0.0))
    if scheme == "a":
        return F.lit(0.5) + F.lit(0.5) * tf / doc_max_tf
    if scheme == "L":
        return (F.lit(1.0) + _log2(tf)) / (F.lit(1.0) + _log2(doc_mean_tf))
    raise ValueError(f"unknown local scheme {scheme!r}")


def tfidf_postings(
    postings: DataFrame,
    dfs: DataFrame,
    num_docs: int,
    smartirs: str = "nfc",
    eps: float = 1e-12,
    pivot: float | None = None,
    slope: float = 0.65,
) -> DataFrame:
    """postings(doc_id, term_id, tf) → (doc_id, term_id, weight) per SMART-IRS.

    dfs = (term_id, df). Matches ``TfidfModel(smartirs=...)`` apply semantics
    including the |idf|>eps drop and pivoted normalization.
    """
    w_tf, w_df, w_n = smartirs
    if w_tf == "t":
        w_tf = "n"
    tf = F.col("tf").cast("double")

    idf = dfs.select(
        "term_id", smart_global_col(w_df, F.col("df"), num_docs).alias("idf")
    )
    out = postings.join(F.broadcast(idf), "term_id", "left").withColumn(
        "idf", F.coalesce(F.col("idf"), F.lit(0.0))
    )

    if w_tf in ("a", "L"):
        doc_agg = out.groupBy("doc_id").agg(
            F.max("tf").cast("double").alias("_max_tf"),
            F.avg("tf").alias("_mean_tf"),
        )
        out = out.join(doc_agg, "doc_id")
        local = _smart_local_expr(
            w_tf, tf, doc_max_tf=F.col("_max_tf"), doc_mean_tf=F.col("_mean_tf")
        )
    else:
        local = _smart_local_expr(w_tf, tf)

    out = out.filter(F.abs(F.col("idf")) > eps).select(
        "doc_id", "term_id", (local * F.col("idf")).alias("weight")
    )

    if w_n in ("n", "x") and pivot is None:
        return out
    norms = out.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("_norm")
    )
    out = out.join(norms, "doc_id")
    if w_n in ("u", "b") or pivot is not None:
        if pivot is None:
            raise ValueError("pivoted normalization requires an explicit pivot "
                             "(auto-pivot = num_nnz/num_docs; compute upstream)")
        denom = F.lit((1.0 - slope) * pivot) + F.lit(slope) * F.col("_norm")
    else:  # 'c' cosine
        denom = F.col("_norm")
    return out.select(
        "doc_id", "term_id",
        F.when(denom > 0, F.col("weight") / denom)
        .otherwise(F.col("weight")).alias("weight"),
    )


def auto_pivot_u(num_nnz: int, num_docs: int) -> float:
    """smartirs[2]=='u' auto-pivot = num_nnz / num_docs (tfidfmodel.py:400)."""
    return 1.0 * num_nnz / num_docs


def log_entropy_postings(postings: DataFrame, normalize: bool = True) -> DataFrame:
    """LogEntropyModel (logentropy_model.py:59-152) over the postings table."""
    num_docs = postings.select("doc_id").distinct().count()
    cfs = postings.groupBy("term_id").agg(F.sum("tf").alias("cf"))
    p = postings.join(cfs, "term_id").withColumn(
        "_p", F.col("tf").cast("double") / F.col("cf").cast("double")
    )
    import math

    entropy = p.groupBy("term_id").agg(
        (
            F.lit(1.0)
            + F.sum(F.col("_p") * _log2(F.col("_p")))
            / F.lit(math.log2(num_docs + 1.0))
        ).alias("entropy")
    )
    out = postings.join(F.broadcast(entropy), "term_id").select(
        "doc_id", "term_id",
        (_log2(F.col("tf").cast("double") + F.lit(1.0)) * F.col("entropy"))
        .alias("weight"),
    )
    if not normalize:
        return out
    return normalize_postings(out, norm="l2")


def normalize_postings(weighted: DataFrame, norm: str = "l2") -> DataFrame:
    """NormModel / unitvec per doc (matutils.py:699-793). Zero vectors pass
    through unchanged."""
    if norm == "l2":
        n = F.sqrt(F.sum(F.col("weight") * F.col("weight")))
    elif norm == "l1":
        n = F.sum(F.abs(F.col("weight")))
    elif norm == "unique":
        n = F.count(F.lit(1)).cast("double")
    else:
        raise ValueError(f"unsupported norm {norm!r}")
    norms = weighted.groupBy("doc_id").agg(n.alias("_norm"))
    return (
        weighted.join(norms, "doc_id")
        .select(
            "doc_id", "term_id",
            F.when(F.col("_norm") > 0, F.col("weight") / F.col("_norm"))
            .otherwise(F.col("weight")).alias("weight"),
        )
    )


def vocab_transform(postings: DataFrame, id_map: DataFrame) -> DataFrame:
    """``VocabTransform`` (gensim/models/__init__.py:31-68): remap term ids via
    (old_id, new_id); unmapped ids dropped by the inner join."""
    return (
        postings.withColumnRenamed("term_id", "old_id")
        .join(F.broadcast(id_map), "old_id")
        .select("doc_id", F.col("new_id").alias("term_id"), "tf")
    )
