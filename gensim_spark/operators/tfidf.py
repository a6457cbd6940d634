"""TF-IDF (SMART-IRS), log-entropy and vector-norm transformations.

Reference semantics (piskvorky/gensim):

- ``df2idf``: ``add + log_base(N/df)``, default base 2
  (gensim/models/tfidfmodel.py:105-126).
- SMART locals b/n/a/l/d/L (tfidfmodel.py:153-180): ``a`` and ``L`` need a
  per-document max/mean tf (window over doc_id). Globals n/f/t/p
  (tfidfmodel.py:183-208), all log2.
- Apply: ``wlocal(tf) · idf``; positions with ``|idf| ≤ eps`` (1e-12) are
  dropped *before* normalization (tfidfmodel.py:495-506).
- Normalization: 'c' = per-doc L2 unit; pivoted (pivot set):
  ``w / ((1 − slope)·pivot + slope·old_norm)`` where old_norm is L2 for
  'n'/'c', the unique (nonzero-count) norm for 'u', and the char-length norm
  for 'b'; slope default 0.25 (tfidfmodel.py:262,512-543); auto-pivot =
  num_nnz/num_docs for 'u', Σ cf·(len+1)/num_docs for 'b'
  (tfidfmodel.py:400-406). A second |w|>eps drop follows normalization
  (tfidfmodel.py:536-541).
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
    slope: float = 0.25,
    term_lens: DataFrame | None = None,
) -> DataFrame:
    """postings(doc_id, term_id, tf) → (doc_id, term_id, weight) per SMART-IRS.

    dfs = (term_id, df). Matches ``TfidfModel(smartirs=...)`` apply semantics
    (tfidfmodel.py:495-543):

    - positions with |idf| ≤ eps dropped before normalization;
    - pivot=None: 'c' → L2 unit; 'n'/'u'/'b' → unnormalized; then the
      reference's *second* eps drop on |weight| (tfidfmodel.py:536);
    - pivot set: old_norm is the L2 norm for 'n'/'c', the UNIQUE norm
      (nonzero count of the weighted vector) for 'u', and the char-length
      norm ``Σ tf·(len(term)+1)`` over the RAW bow for 'b'
      (tfidfmodel.py:519-523; needs ``term_lens`` = (term_id, term_len));
      weight /= (1−slope)·pivot + slope·old_norm, then |weight| > eps.
    - slope default 0.25 (tfidfmodel.py:262).
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

    weighted = out.filter(F.abs(F.col("idf")) > eps).select(
        "doc_id", "term_id", (local * F.col("idf")).alias("weight")
    )

    if pivot is None:
        # 'n'/'x' and (reference quirk) 'u'/'b' without a pivot: unnormalized.
        if w_n == "c":
            weighted = _l2_normalized(weighted)
        return weighted.filter(F.abs(F.col("weight")) > eps)

    # pivoted: old_norm per doc by scheme (tfidfmodel.py:512-523)
    if w_n == "u":
        norms = weighted.filter(F.col("weight") != 0).groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("double").alias("_norm")
        )
    elif w_n == "b":
        if term_lens is None:
            raise ValueError("smartirs '..b' pivoted norm needs term_lens "
                             "(term_id, term_len) — the char-length norm is "
                             "Σ tf·(term_len+1) over the raw bow")
        norms = (
            postings.join(F.broadcast(term_lens), "term_id")
            .groupBy("doc_id")
            .agg(F.sum(F.col("tf").cast("double")
                       * (F.col("term_len").cast("double") + F.lit(1.0)))
                 .alias("_norm"))
        )
    else:  # 'n'/'x'/'c': L2 of the weighted vector
        norms = weighted.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("_norm")
        )
    denom = F.lit(1.0 - slope) * F.lit(float(pivot)) + F.lit(slope) * F.col("_norm")
    return (
        weighted.join(norms, "doc_id")
        .select("doc_id", "term_id", (F.col("weight") / denom).alias("weight"))
        .filter(F.abs(F.col("weight")) > eps)
    )


def _l2_normalized(weighted: DataFrame) -> DataFrame:
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("_norm")
    )
    return weighted.join(norms, "doc_id").select(
        "doc_id", "term_id",
        F.when(F.col("_norm") > 0, F.col("weight") / F.col("_norm"))
        .otherwise(F.col("weight")).alias("weight"),
    )


def auto_pivot_u(num_nnz: int, num_docs: int) -> float:
    """smartirs[2]=='u' auto-pivot = num_nnz / num_docs (tfidfmodel.py:402)."""
    return 1.0 * num_nnz / num_docs


def auto_pivot_b(cfs: DataFrame, term_lens: DataFrame, num_docs: int) -> float:
    """smartirs[2]=='b' auto-pivot = Σ_terms cf·(len(term)+1) / num_docs
    (tfidfmodel.py:404-406). cfs = (term_id, cf); term_lens = (term_id,
    term_len)."""
    row = (
        cfs.join(term_lens, "term_id")
        .agg(F.sum(F.col("cf").cast("double")
                   * (F.col("term_len").cast("double") + F.lit(1.0))).alias("s"))
        .collect()[0]
    )
    return float(row["s"] or 0.0) / num_docs


def log_entropy_postings(postings: DataFrame, normalize: bool = True) -> DataFrame:
    """LogEntropyModel (logentropy_model.py:59-152) over the postings table.

    The reference computes everything in NATURAL log: entropy
    1 + Σp·ln(p)/ln(n_docs+1) (base-independent — the ratio cancels the
    base) and local weight ln(tf+1) (base-dependent: a log2 local would
    scale every weight by 1/ln 2, invisible under the default L2
    normalization but wrong for normalize=False)."""
    num_docs = postings.select("doc_id").distinct().count()
    cfs = postings.groupBy("term_id").agg(F.sum("tf").alias("cf"))
    p = postings.join(cfs, "term_id").withColumn(
        "_p", F.col("tf").cast("double") / F.col("cf").cast("double")
    )
    import math

    entropy = p.groupBy("term_id").agg(
        (
            F.lit(1.0)
            + F.sum(F.col("_p") * F.log(F.col("_p")))
            / F.lit(math.log(num_docs + 1.0))
        ).alias("entropy")
    )
    out = postings.join(F.broadcast(entropy), "term_id").select(
        "doc_id", "term_id",
        (F.log(F.col("tf").cast("double") + F.lit(1.0)) * F.col("entropy"))
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
