"""KeyedVectors query surface over a (key, vector) DataFrame.

Reference: ``gensim.models.KeyedVectors`` — most_similar
(keyedvectors.py:778-860: weighted mean of pre-normalized input vectors,
post-normalized, cosine against every vector, inputs excluded),
get_mean_vector (keyedvectors.py:455-524), n_similarity
(keyedvectors.py:1238-1262: cosine of the two sets' mean vectors),
similarity / distance / distances / rank.

Spark shape: the inputs (a handful of keys) are the only thing collected;
the scan side stays relational — one pass computing
``dot(v, mean) / ‖v‖`` with JVM array expressions and a TakeOrdered top-k.
Ties are broken (−sim, key) for cross-engine determinism (the reference's
argsort leaves ties unspecified). At web scale this is the brute-force
exact path; the LSH/IVF operators in simsearch.py are the approximate
scale path, exactly as gensim pairs KeyedVectors with its ANN indexers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unitvec(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def fetch_vectors(vecs: DataFrame, keys, key_col: str = "vec_id",
                  vec_col: str = "embedding") -> dict:
    """Collect the input keys' vectors (≤ |keys| rows) as float64."""
    rows = (vecs.filter(F.col(key_col).isin(list(keys)))
            .select(key_col, vec_col).collect())
    return {r[key_col]: np.asarray(r[vec_col], dtype=np.float64)
            for r in rows}


def mean_vector(vecs: DataFrame, keys, weights=None,
                pre_normalize: bool = True, post_normalize: bool = False,
                key_col: str = "vec_id", vec_col: str = "embedding",
                ignore_missing: bool = False) -> np.ndarray:
    """get_mean_vector (keyedvectors.py:455-524): Σ wᵢ·unit(vᵢ) / Σ|wᵢ|,
    optionally unit-normalized."""
    keys = list(keys)
    if not keys:
        raise ValueError("cannot compute mean with no input")
    if weights is None:
        weights = np.ones(len(keys))
    got = fetch_vectors(vecs, keys, key_col, vec_col)
    mean = None
    total = 0.0
    for k, w in zip(keys, weights):
        if k not in got:
            if ignore_missing:
                continue
            raise KeyError(f"Key {k!r} not present")
        v = _unitvec(got[k]) if pre_normalize else got[k]
        mean = w * v if mean is None else mean + w * v
        total += abs(w)
    if total > 0:
        mean = mean / total
    return _unitvec(mean) if post_normalize else mean


def cosine_to_vector(vecs: DataFrame, query: np.ndarray,
                     key_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """dot(v, query)/‖v‖ per row (keyedvectors.py:851) — one relational
    pass, no collect."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return vecs.select(F.col(key_col),
                       F.when(nrm > 0, dot / nrm).otherwise(dot)
                       .alias("sim"))


def most_similar(vecs: DataFrame, positive=None, negative=None,
                 topn: int = 10, key_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """most_similar (keyedvectors.py:778-860) → (key, sim, rank) rows:
    weighted mean of unit input vectors, post-normalized, cosine over the
    whole table with the input keys excluded."""
    positive = list(positive or [])
    negative = list(negative or [])
    keys = positive + negative
    weights = np.concatenate([np.ones(len(positive)),
                              -np.ones(len(negative))]) if keys else None
    mean = mean_vector(vecs, keys, weights, pre_normalize=True,
                       post_normalize=True, key_col=key_col,
                       vec_col=vec_col)
    sims = cosine_to_vector(vecs, mean, key_col, vec_col) \
        .filter(~F.col(key_col).isin(keys))
    from pyspark.sql import Window

    # TakeOrdered top-k (orderBy().limit() → per-partition heaps), NOT a
    # global row_number window which would funnel the whole table through
    # one task; the rank window then runs over ≤topn rows only
    top = sims.orderBy(F.desc("sim"), F.asc(key_col)).limit(topn)
    wnd = Window.orderBy(F.desc("sim"), F.asc(key_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(key_col, F.round("sim", 6).alias("sim"), "rank"))


def n_similarity(vecs: DataFrame, ws1, ws2, key_col: str = "vec_id",
                 vec_col: str = "embedding") -> float:
    """Cosine between two key sets' (raw) mean vectors
    (keyedvectors.py:1238-1262)."""
    m1 = mean_vector(vecs, ws1, pre_normalize=False, key_col=key_col,
                     vec_col=vec_col)
    m2 = mean_vector(vecs, ws2, pre_normalize=False, key_col=key_col,
                     vec_col=vec_col)
    return float(_unitvec(m1) @ _unitvec(m2))


def similarity(vecs: DataFrame, k1, k2, key_col: str = "vec_id",
               vec_col: str = "embedding") -> float:
    """Cosine between two keys (keyedvectors.py:1196-1219)."""
    got = fetch_vectors(vecs, [k1, k2], key_col, vec_col)
    return float(_unitvec(got[k1]) @ _unitvec(got[k2]))


def distances(vecs: DataFrame, key_or_vector, key_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """1 − cosine to every row (keyedvectors.py:1121-1155) as (key, dist)."""
    if np.ndim(key_or_vector) == 0:
        q = fetch_vectors(vecs, [key_or_vector], key_col,
                          vec_col)[key_or_vector]
    else:
        q = np.asarray(key_or_vector, dtype=np.float64)
    sims = cosine_to_vector(vecs, _unitvec(q), key_col, vec_col)
    return sims.select(key_col, (1.0 - F.col("sim")).alias("dist"))


def rank(vecs: DataFrame, k1, k2, key_col: str = "vec_id",
         vec_col: str = "embedding") -> int:
    """Rank of k2 in most_similar(k1) (keyedvectors.py:1099-1119):
    1-based position among all keys sorted by similarity to k1."""
    got = fetch_vectors(vecs, [k1], key_col, vec_col)
    sims = cosine_to_vector(vecs, _unitvec(got[k1]), key_col, vec_col) \
        .filter(F.col(key_col) != k1)
    target = sims.filter(F.col(key_col) == k2).collect()[0]["sim"]
    return int(sims.filter(F.col("sim") > target).count()) + 1
