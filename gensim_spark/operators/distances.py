"""Sparse-vector distance kernels (gensim/matutils.py:796-1029).

The reference exposes ``cossim`` / ``hellinger`` / ``jaccard`` /
``kullback_leibler`` / ``jensen_shannon`` / ``jaccard_distance`` as scalar
functions over single BoW vectors; ``LdaModel.diff`` (ldamodel.py:1420-1513)
builds K×K topic-difference matrices out of them one cell at a time.

Spark shape — two layers:

* **Relational pairwise kernel** (`pairwise_bow_distances`): given a pairs
  table ``(pair_id, id_a, id_b)`` and postings-form vectors on each side,
  every metric is ONE full-outer equijoin on ``(pair_id, term_id)`` followed
  by one hash aggregate — all JVM column expressions, no UDFs, fully
  SQL-expressible (and DuckDB-oracled via the `bow_pair_distances` /
  `lda_topic_diff` driver entries). At 100 TB the join shuffles only the
  *paired* postings (candidate pairs scoped upstream, e.g. by LSH), never
  the corpus cross product.
* **Driver scalars** (`cossim`, `hellinger_bow`, ...): exact ports of the
  reference semantics for model-sized inputs (topic rows, single queries),
  used by `lda_diff` and as the test oracle for the relational layer.

Reference semantics replicated exactly:

* ``cossim`` (matutils.py:796-824): 0.0 when either side is empty; weights
  used as-is (no normalization).
* ``hellinger`` BoW branch (matutils.py:928-961): sqrt(0.5·Σ(√a−√b)²) over
  the id union.
* ``jaccard`` BoW branch (matutils.py:962-1005): 1 − Σ min(a,b) / (Σa + Σb)
  — the "union" is the sum of *all* weights of both bags, intersection the
  per-id minimum.
* ``kullback_leibler`` (matutils.py:878-899): scipy.stats.entropy semantics
  — both vectors renormalized to sum 1; a term with p>0 and q==0 yields +inf
  (never a crash).
* ``jensen_shannon`` (matutils.py:901-926): 0.5·(KL(p̂‖m̂) + KL(q̂‖m̂)) with
  m the *raw* average 0.5·(a+b), each argument renormalized by ``entropy``.
* ``jaccard_distance`` (matutils.py:1008-1029): set form, 1.0 when both
  sets are empty.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- driver scalars (reference-exact) ----------------------------------------


def cossim(vec1, vec2) -> float:
    """Cosine similarity between two BoW lists (matutils.py:796-824)."""
    d1, d2 = dict(vec1), dict(vec2)
    if not d1 or not d2:
        return 0.0
    len1 = math.sqrt(sum(v * v for v in d1.values()))
    len2 = math.sqrt(sum(v * v for v in d2.values()))
    if len(d2) < len(d1):
        d1, d2 = d2, d1
    result = sum(v * d2.get(i, 0.0) for i, v in d1.items())
    return result / (len1 * len2)


def hellinger_bow(vec1, vec2) -> float:
    """Hellinger distance, BoW branch (matutils.py:928-961)."""
    d1, d2 = dict(vec1), dict(vec2)
    ids = set(d1) | set(d2)
    return math.sqrt(0.5 * sum(
        (math.sqrt(d1.get(i, 0.0)) - math.sqrt(d2.get(i, 0.0))) ** 2
        for i in ids))


def jaccard_bow(vec1, vec2) -> float:
    """Jaccard distance, BoW branch (matutils.py:962-1005)."""
    union = sum(w for _, w in vec1) + sum(w for _, w in vec2)
    d1, d2 = dict(vec1), dict(vec2)
    inter = sum(min(w, d2.get(i, 0.0)) for i, w in d1.items())
    return 1.0 - inter / union


def jaccard_distance(set1, set2) -> float:
    """Set-form Jaccard distance (matutils.py:1008-1029)."""
    union = len(set1 | set2)
    if union == 0:
        return 1.0
    return 1.0 - len(set1 & set2) / union


def _entropy(p: np.ndarray, q: np.ndarray) -> float:
    """scipy.stats.entropy(p, q) in numpy: renormalize both, Σ rel_entr —
    p>0,q==0 → +inf; p==0 → 0 contribution."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    p = p / p.sum()
    q = q / q.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, p * (np.log(p) - np.log(q)), 0.0)
    if np.any((p > 0) & (q == 0)):
        return float("inf")
    return float(np.sum(terms))


def kullback_leibler(vec1, vec2) -> float:
    """KL distance over dense distributions (matutils.py:878-899)."""
    return _entropy(vec1, vec2)


def jensen_shannon(vec1, vec2) -> float:
    """JS distance over dense distributions (matutils.py:901-926)."""
    v1 = np.asarray(vec1, dtype=np.float64)
    v2 = np.asarray(vec2, dtype=np.float64)
    avg = 0.5 * (v1 + v2)
    return 0.5 * (_entropy(v1, avg) + _entropy(v2, avg))


# --- relational pairwise kernel -----------------------------------------------

METRICS = ("cossim", "hellinger", "jaccard", "kullback_leibler",
           "jensen_shannon")


def pairwise_bow_distances(pairs: DataFrame, a: DataFrame, b: DataFrame,
                           metrics=("cossim", "hellinger", "jaccard"),
                           id_col: str = "doc_id",
                           weight_col: str = "weight") -> DataFrame:
    """Distances for candidate pairs over postings-form vectors.

    ``pairs``: (pair_id, id_a, id_b); ``a``/``b``: (id_col, term_id,
    weight_col). Returns (pair_id, id_a, id_b, <one column per metric>).

    Plan: broadcast-or-shuffle equijoin of each side onto its pair ids, one
    full-outer join on (pair_id, term_id), one hash aggregate — every metric
    is a column expression over the same grouped scan, so asking for five
    metrics costs the same single shuffle as one.
    """
    bad = set(metrics) - set(METRICS)
    if bad:
        raise ValueError(f"unknown metrics {sorted(bad)}; valid: {METRICS}")

    pa = (pairs.join(a.select(F.col(id_col).alias("id_a"), "term_id",
                              F.col(weight_col).cast("double").alias("wa")),
                     "id_a")
          .select("pair_id", "term_id", "wa"))
    pb = (pairs.join(b.select(F.col(id_col).alias("id_b"), "term_id",
                              F.col(weight_col).cast("double").alias("wb")),
                     "id_b")
          .select("pair_id", "term_id", "wb"))
    joined = (pa.join(pb, ["pair_id", "term_id"], "full_outer")
              .select("pair_id",
                      F.coalesce("wa", F.lit(0.0)).alias("wa"),
                      F.coalesce("wb", F.lit(0.0)).alias("wb")))

    wa, wb = F.col("wa"), F.col("wb")
    aggs = [
        F.sum(wa * wb).alias("_dot"),
        F.sum(wa * wa).alias("_na2"),
        F.sum(wb * wb).alias("_nb2"),
        F.sum(wa).alias("_sa"),
        F.sum(wb).alias("_sb"),
        F.sum(F.pow(F.sqrt(wa) - F.sqrt(wb), F.lit(2.0))).alias("_h2"),
        F.sum(F.least(wa, wb)).alias("_inter"),
        # any term with p>0 but q==0 → KL = +inf (scipy rel_entr)
        F.max(F.when((wa > 0) & (wb == 0), True).otherwise(False))
        .alias("_kl_inf"),
        F.sum(F.when((wa > 0) & (wb > 0), wa * (F.log(wa) - F.log(wb)))
              .otherwise(F.lit(0.0))).alias("_plogpq"),
        # JS pieces against the raw average m = (wa+wb)/2 (never 0 when
        # the side is >0, so no inf branch)
        F.sum(F.when(wa > 0, wa * (F.log(wa) - F.log((wa + wb) / 2)))
              .otherwise(F.lit(0.0))).alias("_pam"),
        F.sum(F.when(wb > 0, wb * (F.log(wb) - F.log((wa + wb) / 2)))
              .otherwise(F.lit(0.0))).alias("_pbm"),
    ]
    g = joined.groupBy("pair_id").agg(*aggs)

    sa, sb = F.col("_sa"), F.col("_sb")
    both = (sa > 0) & (sb > 0)  # distribution metrics undefined on empties
    cols = {
        # empty side → 0.0, matching the reference's early return
        "cossim": F.when((F.col("_na2") == 0) | (F.col("_nb2") == 0),
                         F.lit(0.0))
        .otherwise(F.col("_dot") / (F.sqrt("_na2") * F.sqrt("_nb2"))),
        "hellinger": F.sqrt(0.5 * F.col("_h2")),
        "jaccard": F.when(sa + sb > 0,
                          F.lit(1.0) - F.col("_inter") / (sa + sb)),
        # KL(p̂‖q̂) with p̂=wa/Σwa: Σ p̂·ln(p̂/q̂)
        #   = (Σ wa·ln(wa/wb))/Σwa + ln(Σwb/Σwa)
        "kullback_leibler": F.when(~both, F.lit(None))
        .when(F.col("_kl_inf"), F.lit(float("inf")))
        .otherwise(F.col("_plogpq") / sa + F.log(sb / sa)),
        # entropy(a, m) renormalizes by Σm = (Σa+Σb)/2
        "jensen_shannon": F.when(both, 0.5 * (
            (F.col("_pam") / sa + F.log((sa + sb) / (2 * sa)))
            + (F.col("_pbm") / sb + F.log((sa + sb) / (2 * sb))))),
    }
    out = g.select("pair_id",
                   *[cols[m].alias(m) for m in metrics])
    return pairs.join(out, "pair_id", "left").select(
        "pair_id", "id_a", "id_b",
        *[F.coalesce(F.col(m),
                     # no postings on either side: cossim 0 and hellinger 0
                     # (the driver scalars return 0.0 on two empty bows);
                     # jaccard/KL/JS stay NULL — undefined, like the
                     # in-join zero-mass rows
                     F.lit(0.0) if m in ("cossim", "hellinger")
                     else F.lit(None)
                     ).alias(m) for m in metrics])


# --- LdaModel.diff ------------------------------------------------------------


def topic_postings(spark, topics: np.ndarray) -> DataFrame:
    """K×V topic-term matrix → postings (topic_id, term_id, p) rows."""
    rows = [(t, int(w), float(topics[t, w]))
            for t in range(topics.shape[0])
            for w in np.nonzero(topics[t])[0]]
    return spark.createDataFrame(rows, "topic_id long, term_id long, p double")


def topic_diff_df(spark, topics_a: DataFrame, topics_b: DataFrame,
                  distance: str = "hellinger",
                  normed: bool = True) -> DataFrame:
    """Relational LdaModel.diff: the K_a×K_b difference matrix as rows
    (topic_a, topic_b, d) via one pairwise kernel call; ``normed`` divides
    by the global max (ldamodel.py:1507-1509).

    ``topics_a/b``: postings-form (topic_id, term_id, p)."""
    ka = [r[0] for r in topics_a.select("topic_id").distinct().collect()]
    kb = [r[0] for r in topics_b.select("topic_id").distinct().collect()]
    pairs = spark.createDataFrame(
        [(i * len(kb) + j, int(ta), int(tb))
         for i, ta in enumerate(sorted(ka))
         for j, tb in enumerate(sorted(kb))],
        "pair_id long, id_a long, id_b long")
    d = pairwise_bow_distances(
        F.broadcast(pairs), topics_a, topics_b, metrics=(distance,),
        id_col="topic_id", weight_col="p")
    out = d.select(F.col("id_a").alias("topic_a"),
                   F.col("id_b").alias("topic_b"),
                   F.col(distance).alias("d"))
    if normed:
        from pyspark.sql import Window

        w = Window.partitionBy()  # K×K rows — model-sized, not corpus-sized
        out = out.withColumn(
            "d", F.when(F.abs(F.max("d").over(w)) > 1e-8,
                        F.col("d") / F.max("d").over(w))
            .otherwise(F.col("d")))
    return out.select("topic_a", "topic_b", F.col("d").cast("double"))


def lda_diff(topics1: np.ndarray, topics2: np.ndarray,
             distance: str = "kullback_leibler", num_words: int = 100,
             n_ann_terms: int = 10, diagonal: bool = False,
             annotation: bool = True, normed: bool = True):
    """Driver-side LdaModel.diff over two K×V topic matrices
    (ldamodel.py:1420-1513): returns (z, annotation_terms).

    Annotation uses term ids (the reference uses id2word tokens; callers
    holding a vocab can map). The K×V matrices are model-sized — the
    reference's own driver-resident representation."""
    dist_funcs = {
        "kullback_leibler": kullback_leibler,
        "hellinger": lambda p, q: float(
            math.sqrt(0.5 * ((np.sqrt(p) - np.sqrt(q)) ** 2).sum())),
        "jaccard": jaccard_distance,
        "jensen_shannon": jensen_shannon,
    }
    if distance not in dist_funcs:
        raise ValueError(f"Incorrect distance, valid only "
                         f"{', '.join(dist_funcs)}")
    fn = dist_funcs[distance]
    d1, d2 = topics1, topics2
    t1, t2 = d1.shape[0], d2.shape[0]
    fst = [set(np.argsort(-d1[t], kind="stable")[:num_words].tolist())
           for t in range(t1)]
    snd = [set(np.argsort(-d2[t], kind="stable")[:num_words].tolist())
           for t in range(t2)]
    if distance == "jaccard":
        d1, d2 = fst, snd
    if diagonal:
        assert t1 == t2, "diagonal diff needs equal topic counts"
        z = np.zeros(t1)
        ann = np.zeros(t1, dtype=object) if annotation else None
    else:
        z = np.zeros((t1, t2))
        ann = np.zeros((t1, t2), dtype=object) if annotation else None
    for idx in np.ndindex(z.shape):
        i = idx[0]
        j = i if diagonal else idx[1]
        z[idx] = fn(d1[i], d2[j])
        if annotation:
            pos = sorted(fst[i] & snd[j])[:n_ann_terms]
            neg = sorted(fst[i] ^ snd[j])[:n_ann_terms]
            ann[idx] = [pos, neg]
    if normed and np.abs(np.max(z)) > 1e-8:
        z = z / np.max(z)
    return z, ann
