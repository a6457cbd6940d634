"""Word Mover's Distance — exact EMD scoring with a relational RWMD prune.

Reference semantics: ``KeyedVectors.wmdistance``
(gensim/models/keyedvectors.py:918-1012) — drop OOV tokens, ``inf`` when a
side empties, ``0.0`` when the union vocabulary is one token, unit-normalize
vectors (``norm=True``), euclidean cost matrix over doc1-tokens ×
doc2-tokens, nbow = tf / len(in-vocab tokens), cost = exact optimal
transport; the all-zero cost matrix returns ``inf``
(keyedvectors.py:992-995). ``WmdSimilarity`` ranks docs by
``1 / (1 + wmd)`` (gensim/similarities/docsim.py:1009-1113).

Spark-first decomposition (Kusner et al. 2015, "From Word Embeddings To
Document Distances", the same paper the reference cites):

1. **RWMD** (relaxed WMD, the paper's tightest cheap lower bound
   ``max(l1, l2)``) is pure relational algebra: broadcast the query tokens
   against each doc's tokens, per-pair euclidean distance in whole-stage
   codegen, two min-aggregations, two weighted sums. One shuffle keyed by
   (query_id, doc_id) — linear in Σ|doc| · |query|, no Python.
2. **Exact WMD** is one tiny transportation LP per *candidate pair*
   (operators/transport.py), run inside an Arrow-batched ``applyInPandas``
   — the slow path never sees a non-candidate.
3. **Exact top-k without scoring everything**: prefetch-and-prune
   (the paper's §5, restated set-at-a-time instead of doc-at-a-time):
   exact-score the k RWMD-nearest docs, take θ = worst of those k, then
   exact-score only the remaining docs with RWMD ≤ θ. Since RWMD ≤ WMD,
   every pruned doc is provably outside the top-k — the result is exact,
   and the LP count is k + |ε-band| instead of |corpus|.

Word vectors: any ``(token, v0..v{dim-1})`` DataFrame works. The built-in
source is the deterministic cross-engine hash vector (md5-based ``hash60``,
the same construction as operators/rp.py) so tests and the DuckDB oracle
reproduce the Spark results bit-for-bit with no external embedding data.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gensim_spark.functions.hashing import hash60, hash60_sql

DIM = 8


# --- deterministic hash word-vectors (cross-engine) ---------------------------

def _raw_component(token_col, d: int):
    """Uniform-ish in [-1, 1]: (hash60('wv_<token>_<d>') % 2000001)/1e6 - 1."""
    key = F.concat(F.lit("wv_"), token_col.cast("string"), F.lit(f"_{d}"))
    return (hash60(key) % 2000001) / F.lit(1000000.0) - F.lit(1.0)


def _raw_component_sql(token_expr: str, d: int) -> str:
    key = f"'wv_' || CAST({token_expr} AS VARCHAR) || '_{d}'"
    return f"(({hash60_sql(key)}) % 2000001) / 1000000.0 - 1.0"


def with_hash_vectors(df: DataFrame, token_col: str = "token",
                      dim: int = DIM, norm: bool = True,
                      prefix: str = "v") -> DataFrame:
    """Append ``prefix0..prefix{dim-1}`` hash-vector columns (unit-normalized
    when ``norm``, matching wmdistance's default)."""
    raw = [_raw_component(F.col(token_col), d) for d in range(dim)]
    if norm:
        nrm = F.sqrt(sum((r * r for r in raw), F.lit(0.0)))
        raw = [r / nrm for r in raw]
    return df.select("*", *[raw[d].alias(f"{prefix}{d}") for d in range(dim)])


def hash_vector_sql(token_expr: str, dim: int = DIM,
                    norm: bool = True) -> list[str]:
    """DuckDB replicas of :func:`with_hash_vectors`'s component expressions."""
    raw = [_raw_component_sql(token_expr, d) for d in range(dim)]
    if not norm:
        return raw
    nrm = "sqrt(" + " + ".join(f"({r}) * ({r})" for r in raw) + ")"
    return [f"({r}) / {nrm}" for r in raw]


# --- nbow ---------------------------------------------------------------------

def nbow(token_rows: DataFrame, vectors: DataFrame | None = None,
         id_col: str = "doc_id", dim: int = DIM) -> DataFrame:
    """(id, token) rows → (id, token, w, v0..) with w = tf / in-vocab length.

    ``vectors`` restricts to its vocabulary (the reference's OOV drop, with
    the nbow renormalized over the surviving tokens exactly like
    keyedvectors.py:962-966 recomputes doc_len after filtering). ``None``
    uses hash vectors — every token in-vocab.
    """
    tf = token_rows.groupBy(id_col, "token").agg(F.count("*").alias("_tf"))
    if vectors is None:
        tf = with_hash_vectors(tf, dim=dim)
    else:
        tf = tf.join(vectors, "token")
    dl = F.sum("_tf").over(Window.partitionBy(id_col))
    return (tf.withColumn("w", F.col("_tf") / dl)
            .drop("_tf"))


# --- RWMD (relational lower bound) ---------------------------------------------

def _dist_expr(dim: int):
    sq = sum(((F.col(f"qv{d}") - F.col(f"v{d}")) ** 2 for d in range(dim)),
             F.lit(0.0))
    return F.sqrt(sq)


def rwmd(doc_nbow: DataFrame, query_nbow: DataFrame, dim: int = DIM,
         max_compiled_tokens: int = 256) -> DataFrame:
    """max(l1, l2) per (query_id, doc_id) — Kusner's RWMD.

    Fast path (queries ≤ ``max_compiled_tokens`` total tokens): the query
    side is collected (query-sized, like every query-lookup in this repo)
    and COMPILED into aggregate expressions — per query token j,
    ``m_j = min over the doc's tokens of dist(token, c_j)`` with the query
    vector c_j a literal, plus ``l2 = Σ w·least_j(dist_j)`` — so the whole
    bound is ONE hash-agg pass over doc_nbow: no join, no window, one
    (doc_id-keyed, map-side-combined) exchange. That is the plan that
    survives 10^12 docs.

    Larger query sets fall back to the relational two-aggregation form
    (:func:`_rwmd_relational`) whose shape the DuckDB oracle mirrors.
    """
    qrows = query_nbow.limit(max_compiled_tokens + 1).collect()
    if len(qrows) > max_compiled_tokens:
        return _rwmd_relational(doc_nbow, query_nbow, dim)
    by_q: dict = {}
    for r in qrows:
        by_q.setdefault(r["query_id"], []).append(
            (float(r["w"]), [float(r[f"v{d}"]) for d in range(dim)]))
    if not by_q:
        return _rwmd_relational(doc_nbow, query_nbow, dim)

    def dist_to(c):
        sq = sum(((F.col(f"v{d}") - F.lit(c[d])) ** 2 for d in range(dim)),
                 F.lit(0.0))
        return F.sqrt(sq)

    aggs, finals = [], []
    for qid, toks in by_q.items():
        dists = [dist_to(c) for _w, c in toks]
        for j, dj in enumerate(dists):
            aggs.append(F.min(dj).alias(f"_m_{qid}_{j}"))
        aggs.append(F.sum(F.col("w") * F.least(*dists)
                          if len(dists) > 1
                          else F.col("w") * dists[0]).alias(f"_l2_{qid}"))
        l1 = sum((F.lit(w) * F.col(f"_m_{qid}_{j}")
                  for j, (w, _c) in enumerate(toks)), F.lit(0.0))
        finals.append(F.struct(
            F.lit(qid).alias("query_id"),
            F.greatest(l1, F.col(f"_l2_{qid}")).alias("rwmd")))
    wide = doc_nbow.groupBy("doc_id").agg(*aggs)
    return (wide.select("doc_id", F.explode(F.array(*finals)).alias("_p"))
            .select(F.col("_p.query_id").alias("query_id"), "doc_id",
                    F.col("_p.rwmd").alias("rwmd")))


def _rwmd_relational(doc_nbow: DataFrame, query_nbow: DataFrame,
                     dim: int = DIM) -> DataFrame:
    """Relational RWMD (broadcast query join + two min/sum aggregations) —
    the shape the DuckDB oracle replicates; fallback for query sets too
    large to compile into expressions."""
    q = query_nbow.select(
        "query_id", F.col("token").alias("qtoken"), F.col("w").alias("qw"),
        *[F.col(f"v{d}").alias(f"qv{d}") for d in range(dim)])
    pairs = (doc_nbow.join(F.broadcast(q))
             .withColumn("_dist", _dist_expr(dim)))
    l1 = (pairs.groupBy("query_id", "doc_id", "qtoken")
          .agg(F.min("_dist").alias("_md"), F.first("qw").alias("_qw"))
          .groupBy("query_id", "doc_id")
          .agg(F.sum(F.col("_md") * F.col("_qw")).alias("l1")))
    l2 = (pairs.groupBy("query_id", "doc_id", "token")
          .agg(F.min("_dist").alias("_md"), F.first("w").alias("_dw"))
          .groupBy("query_id", "doc_id")
          .agg(F.sum(F.col("_md") * F.col("_dw")).alias("l2")))
    return (l1.join(l2, ["query_id", "doc_id"])
            .select("query_id", "doc_id",
                    F.greatest("l1", "l2").alias("rwmd")))


# --- exact WMD over candidate pairs --------------------------------------------

_WMD_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("wmd", T.DoubleType()),
])


def _pair_rows(doc_nbow: DataFrame, query_nbow: DataFrame,
               candidates: DataFrame, dim: int) -> DataFrame:
    """Long rows (query_id, doc_id, side, token, w, v0..) for candidate
    pairs: side 0 = query tokens, side 1 = doc tokens."""
    vcols = [f"v{d}" for d in range(dim)]
    cand = candidates.select("query_id", "doc_id")
    qside = (query_nbow.join(cand, "query_id")
             .select("query_id", "doc_id", F.lit(0).alias("side"),
                     "token", "w", *vcols))
    dside = (doc_nbow.join(cand, "doc_id")
             .select("query_id", "doc_id", F.lit(1).alias("side"),
                     "token", "w", *vcols))
    return qside.unionByName(dside)


def wmd_pairs(doc_nbow: DataFrame, query_nbow: DataFrame,
              candidates: DataFrame, dim: int = DIM) -> DataFrame:
    """Exact WMD for each (query_id, doc_id) in ``candidates``: one
    transportation LP per pair inside applyInPandas (Arrow batches; the
    group key bounds each LP at |query| × |doc| unique tokens)."""
    vcols = [f"v{d}" for d in range(dim)]

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        from gensim_spark.operators.transport import emd

        qid = int(pdf["query_id"].iloc[0])
        did = int(pdf["doc_id"].iloc[0])
        q = pdf[pdf["side"] == 0]
        d = pdf[pdf["side"] == 1]
        union = set(q["token"]) | set(d["token"])
        if len(q) == 0 or len(d) == 0:
            val = math.inf                       # keyedvectors.py:970-972
        elif len(union) == 1:
            val = 0.0                            # keyedvectors.py:978-980
        else:
            vq = q[vcols].to_numpy(dtype=np.float64)
            vd = d[vcols].to_numpy(dtype=np.float64)
            cost = np.sqrt(
                ((vq[:, None, :] - vd[None, :, :]) ** 2).sum(axis=2))
            if abs(cost).sum() < 1e-8:
                val = math.inf                   # keyedvectors.py:992-995
            else:
                a = q["w"].to_numpy(dtype=np.float64)
                b = d["w"].to_numpy(dtype=np.float64)
                val = emd(a / a.sum(), b / b.sum(), cost)[0]
        return pd.DataFrame({"query_id": [qid], "doc_id": [did],
                             "wmd": [val]})

    rows = _pair_rows(doc_nbow, query_nbow, candidates, dim)
    return rows.groupBy("query_id", "doc_id").applyInPandas(
        solve, schema=_WMD_SCHEMA)


def wmd_exact_candidates(doc_nbow: DataFrame, query_nbow: DataFrame,
                         k: int = 10, dim: int = DIM,
                         eps: float = 1e-9) -> DataFrame:
    """The prefetch-and-prune survivor set with their EXACT LP distances:
    (query_id, doc_id, wmd) for every document whose RWMD lower bound does
    not already exclude it from the top k.

    Correctness: RWMD ≤ WMD, so a doc with RWMD > θ (the worst exact score
    among the k RWMD-nearest) cannot displace any of those k."""
    r = rwmd(doc_nbow, query_nbow, dim=dim).cache()
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("rwmd").asc(), F.col("doc_id").asc())
    prefetch = (r.withColumn("_rk", F.row_number().over(w_r))
                .filter(F.col("_rk") <= k).drop("_rk"))
    # the LP stage is the expensive Python path and exact1 feeds BOTH the
    # θ computation and the returned union — materialize it once so the
    # k·|queries| prefetch solves never run twice; the RWMD cache can then
    # be released (the band filter below is the last reader)
    exact1 = wmd_pairs(doc_nbow, query_nbow, prefetch, dim=dim) \
        .localCheckpoint(eager=True)
    theta = exact1.groupBy("query_id").agg(F.max("wmd").alias("_theta"))
    band = (r.join(prefetch.select("query_id", "doc_id"),
                   ["query_id", "doc_id"], "left_anti")
            .join(theta, "query_id")
            .filter(F.col("rwmd") <= F.col("_theta") + eps))
    exact2 = wmd_pairs(doc_nbow, query_nbow, band, dim=dim) \
        .localCheckpoint(eager=True)
    r.unpersist()
    return exact1.unionByName(exact2)


def wmd_rank_candidates(all_exact: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, doc_id, wmd) candidates → top-k with rank 1..k ascending
    wmd, doc_id-ascending ties — the relational retrieval tail."""
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("wmd").asc(), F.col("doc_id").asc())
    return (all_exact.withColumn("rank", F.row_number().over(w_f))
            .filter(F.col("rank") <= k))


def wmd_topk(doc_nbow: DataFrame, query_nbow: DataFrame, k: int = 10,
             dim: int = DIM, eps: float = 1e-9) -> DataFrame:
    """Exact WMD top-k via prefetch-and-prune (module docstring #3):
    returns (query_id, doc_id, wmd, rank) with rank 1..k ascending wmd."""
    return wmd_rank_candidates(
        wmd_exact_candidates(doc_nbow, query_nbow, k=k, dim=dim, eps=eps),
        k=k)


def wmd_similarity_topk(doc_nbow: DataFrame, query_nbow: DataFrame,
                        num_best: int = 10, dim: int = DIM) -> DataFrame:
    """WmdSimilarity surface (docsim.py:1009-1113): similarity =
    1 / (1 + wmd), ranked descending."""
    out = wmd_topk(doc_nbow, query_nbow, k=num_best, dim=dim)
    return out.select("query_id", "doc_id",
                      (F.lit(1.0) / (F.lit(1.0) + F.col("wmd")))
                      .alias("similarity"), "rank")


# --- DuckDB oracle for the RWMD (relational) path --------------------------------

def rwmd_topk_sql(queries_: dict[int, str], k: int, dim: int = DIM,
                  token_filter: str = "len(t) BETWEEN 2 AND 15 AND t[1] <> '_'",
                  ) -> str:
    """ANSI SQL replicating tokenize → nbow → hash vectors → RWMD → top-k
    over the ``documents`` view (bit-identical arithmetic to the Spark path)."""
    vals = ", ".join(f"({qid}, '{text}')" for qid, text in queries_.items())
    dvec = hash_vector_sql("token", dim)
    qvec = hash_vector_sql("qtoken", dim)
    dcols = ",\n         ".join(f"{e} AS v{d}" for d, e in enumerate(dvec))
    qcols = ",\n         ".join(f"{e} AS qv{d}" for d, e in enumerate(qvec))
    dist = "sqrt(" + " + ".join(
        f"(q.qv{d} - d.v{d}) * (q.qv{d} - d.v{d})" for d in range(dim)) + ")"
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '[a-z_]+'),
                     t -> {token_filter}) AS tokens
  FROM documents
),
tlong AS (SELECT doc_id, unnest(tokens) AS token FROM tok),
dtf AS (SELECT doc_id, token, count(*) AS tf FROM tlong GROUP BY 1, 2),
dn AS (
  SELECT doc_id, token, tf / sum(tf) OVER (PARTITION BY doc_id) AS w,
         {dcols}
  FROM dtf
),
qraw AS (SELECT * FROM (VALUES {vals}) AS q(query_id, qtext)),
qlong AS (
  SELECT query_id,
         unnest(list_filter(regexp_extract_all(lower(qtext), '[a-z_]+'),
                t -> {token_filter})) AS qtoken
  FROM qraw),
qtf AS (SELECT query_id, qtoken, count(*) AS tf FROM qlong GROUP BY 1, 2),
qn AS (
  SELECT query_id, qtoken, tf / sum(tf) OVER (PARTITION BY query_id) AS qw,
         {qcols}
  FROM qtf
),
pairs AS (
  SELECT q.query_id, d.doc_id, q.qtoken, d.token, q.qw, d.w,
         {dist} AS dist
  FROM dn d CROSS JOIN qn q
),
l1 AS (
  SELECT query_id, doc_id, sum(md * qw) AS l1
  FROM (SELECT query_id, doc_id, qtoken, min(dist) AS md, any_value(qw) AS qw
        FROM pairs GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
l2 AS (
  SELECT query_id, doc_id, sum(md * w) AS l2
  FROM (SELECT query_id, doc_id, token, min(dist) AS md, any_value(w) AS w
        FROM pairs GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, doc_id, round(greatest(l1.l1, l2.l2), 6) AS rwmd
  FROM l1 JOIN l2 USING (query_id, doc_id)
),
ranked AS (
  SELECT query_id, doc_id, rwmd,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY rwmd ASC, doc_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, doc_id, rwmd, rank FROM ranked WHERE rank <= {k}
"""
