"""Translation matrix between two embedding spaces.

Reference: ``gensim.models.translation_matrix`` — TranslationMatrix
(translation_matrix.py:168-366: build normalized Spaces over the training
word pairs, W = lstsq(m1, m2), translate by cosine retrieval of W-mapped
source vectors in the target space) and BackMappingTranslationMatrix
(translation_matrix.py:369-450: same lstsq between two document-vector
spaces, un-normalized).

Spark shape: the least squares never materializes the pair matrices — the
d×d normal-equation blocks XᵀX and XᵀY are distributed sums of per-pair
outer products (one Arrow-batched pass, packed ``(i, v)`` partials,
map-side combined), and the driver solves the d×d system. For full-rank
XᵀX this equals ``np.linalg.lstsq(m1, m2)`` exactly (pinv(A) ≡
pinv(AᵀA)·Aᵀ), which the tests assert; d is the embedding width (≤ a few
thousand), so the driver solve is trivial while the pair set can be
web-scale. Retrieval is the existing relational top-k: cosine of mapped
(unit) source vectors against the unit target space, ranked per source —
``np.argsort`` ties broken by (−sim, target id) deterministically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_rows(vecs: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Unit-l2 rows (Space.normalize, translation_matrix.py:150-156), in
    double precision. Zero vectors pass through unchanged."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return vecs.select(
        F.col(id_col),
        F.when(nrm > 0, F.transform(v, lambda x: x / nrm))
        .otherwise(v).alias(vec_col))


def normal_equations(pairs: DataFrame, src: DataFrame, tgt: DataFrame,
                     dims: int,
                     src_id: str = "src_id", tgt_id: str = "tgt_id",
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> tuple:
    """(XᵀX, XᵀY) over the pair set: one Arrow pass, d² packed partials per
    task. ``src``/``tgt`` rows must already be in the representation the
    caller wants regressed (normalized for TranslationMatrix, raw for
    BackMapping)."""
    joined = (pairs
              .join(src.select(F.col(id_col).alias(src_id),
                               F.col(vec_col).alias("_x")), src_id)
              .join(tgt.select(F.col(id_col).alias(tgt_id),
                               F.col(vec_col).alias("_y")), tgt_id)
              .select("_x", "_y"))
    d = int(dims)

    def gen(batches):
        import pandas as pd

        xtx = np.zeros((d, d))
        xty = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(r, dtype=np.float64)
                          for r in pdf["_x"]])
            y = np.array([np.asarray(r, dtype=np.float64)
                          for r in pdf["_y"]])
            xtx += x.T @ x
            xty += x.T @ y
        i = np.arange(2 * d * d, dtype=np.int64)
        yield pd.DataFrame({"i": i,
                            "v": np.concatenate([xtx.ravel(), xty.ravel()])})

    rows = (joined.mapInPandas(gen, "i long, v double")
            .groupBy("i").agg(F.sum("v").alias("v")).collect())
    flat = np.zeros(2 * d * d)
    for r in rows:
        flat[r["i"]] = r["v"]
    return flat[:d * d].reshape(d, d), flat[d * d:].reshape(d, d)


def fit_translation_matrix(pairs: DataFrame, src: DataFrame, tgt: DataFrame,
                           dims: int, normalize: bool = True,
                           **kw) -> np.ndarray:
    """W with m1·W ≈ m2 (translation_matrix.py:236-256). ``normalize=True``
    is the TranslationMatrix path (unit rows first); False is BackMapping
    (translation_matrix.py:414-436, raw document vectors)."""
    if normalize:
        id_col = kw.get("id_col", "vec_id")
        vec_col = kw.get("vec_col", "embedding")
        src = normalize_rows(src, id_col, vec_col)
        tgt = normalize_rows(tgt, id_col, vec_col)
    xtx, xty = normal_equations(pairs, src, tgt, dims, **kw)
    # minimum-norm least squares on the normal equations: pinv(AᵀA)·AᵀB ≡
    # pinv(A)·B = np.linalg.lstsq(A, B) — exact for full rank, the
    # reference's SVD solution otherwise
    return np.linalg.pinv(xtx) @ xty


def apply_transmat(vecs: DataFrame, w: np.ndarray, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """z = x·W per row (translation_matrix.py:263-277), Arrow-batched."""
    spark = vecs.sparkSession
    bc = spark.sparkContext.broadcast(w)

    def gen(batches):
        import pandas as pd

        wmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(r, dtype=np.float64)
                          for r in pdf[vec_col]])
            z = x @ wmat
            yield pd.DataFrame({id_col: pdf[id_col],
                                vec_col: list(z)})

    return vecs.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, {vec_col} array<double>")


def translate(source: DataFrame, target: DataFrame, w: np.ndarray,
              topn: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Cosine retrieval of W-mapped sources in the target space
    (translation_matrix.py:279-366, gc=0 path): both spaces unit-normalized,
    sim = dot, top-n per source → (src_id, rank, tgt_id, sim). The argsort
    tie order is made deterministic as (−sim, tgt_id)."""
    mapped = apply_transmat(normalize_rows(source, id_col, vec_col),
                            w, id_col, vec_col)
    tgt_n = normalize_rows(target, id_col, vec_col)
    from pyspark.sql import Window

    q = mapped.select(F.col(id_col).alias("src_id"),
                      F.col(vec_col).alias("_q"))
    t = tgt_n.select(F.col(id_col).alias("tgt_id"),
                     F.col(vec_col).alias("_t"))
    sim = F.aggregate(F.zip_with("_q", "_t", lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    scored = (F.broadcast(q).crossJoin(t)
              .select("src_id", "tgt_id", sim.alias("sim")))
    wnd = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("tgt_id"))
    return (scored.withColumn("rank", F.row_number().over(wnd))
            .filter(F.col("rank") <= topn)
            .select("src_id", "rank", "tgt_id", F.round("sim", 6).alias("sim")))


def infer_vector(vec: np.ndarray, w: np.ndarray) -> np.ndarray:
    """BackMapping infer_vector (translation_matrix.py:438-450): one
    driver-side product for a single document vector."""
    return np.asarray(vec, dtype=np.float64) @ w
