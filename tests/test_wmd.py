"""WMD (operators/wmd.py + operators/transport.py).

Layered evidence:
1. the transportation simplex vs a brute-force LP-vertex enumeration oracle,
2. the distributed exact WMD vs an independent local numpy replica of the
   reference's ``wmdistance`` contract (keyedvectors.py:918-1012 semantics:
   OOV drop → inf/0 edges, unit-normalized vectors, euclidean cost, nbow),
3. RWMD ≤ WMD on every pair (the bound the prune relies on) and
   prefetch-and-prune top-k == score-everything top-k,
4. the DuckDB SQL oracle reproducing the relational RWMD bit-for-bit.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import wmd as W
from gensim_spark.operators.transport import emd, emd_bruteforce
from tests.conftest import COMMON_TEXTS, docs_df

DIM = 4


def test_emd_matches_bruteforce_vertex_enumeration():
    rng = np.random.default_rng(42)
    for t in range(60):
        m, n = rng.integers(1, 4, size=2)
        a = rng.random(m) + 0.01
        b = rng.random(n) + 0.01
        a, b = a / a.sum(), b / b.sum()
        c = rng.random((m, n))
        got, plan = emd(a, b, c)
        assert got == pytest.approx(emd_bruteforce(a, b, c), abs=1e-8), t
        assert np.allclose(plan.sum(1), a, atol=1e-9)
        assert np.allclose(plan.sum(0), b, atol=1e-9)


def test_emd_degenerate_ties():
    rng = np.random.default_rng(7)
    for t in range(40):
        m, n = rng.integers(2, 5, size=2)
        a = rng.integers(1, 4, m).astype(float)
        b = rng.integers(1, 4, n).astype(float)
        a, b = a / a.sum(), b / b.sum()
        c = rng.integers(0, 3, (m, n)).astype(float)
        assert emd(a, b, c)[0] == pytest.approx(
            emd_bruteforce(a, b, c), abs=1e-8), t


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as hnp

    @settings(max_examples=150, deadline=None)
    @given(
        m=st.integers(1, 4), n=st.integers(1, 4),
        data=st.data(),
    )
    def test_emd_property_vs_bruteforce(m, n, data):
        """Hypothesis sweep: solver == brute-force vertex enumeration on
        arbitrary masses/costs, including heavy degeneracy (tied costs)."""
        a = np.array(data.draw(st.lists(
            st.floats(0.01, 10.0, allow_nan=False), min_size=m, max_size=m)))
        b = np.array(data.draw(st.lists(
            st.floats(0.01, 10.0, allow_nan=False), min_size=n, max_size=n)))
        a, b = a / a.sum(), b / b.sum()
        c = data.draw(hnp.arrays(
            np.float64, (m, n),
            elements=st.sampled_from([0.0, 0.5, 1.0, 1.5, 2.0, 3.0])))
        got, plan = emd(a, b, c)
        want = emd_bruteforce(a, b, c)
        assert got == pytest.approx(want, abs=1e-8)
        assert np.allclose(plan.sum(1), a, atol=1e-9)
        assert np.allclose(plan.sum(0), b, atol=1e-9)
except ImportError:  # pragma: no cover - hypothesis is in this env
    pass


def _local_wmdistance(doc1, doc2, vecs):
    """Independent numpy replica of the reference wmdistance contract.

    ``vecs``: token -> unit vector. Structured like keyedvectors.py:955-1012
    (OOV filter, inf/0 edges, euclidean cdist, nbow over filtered length)
    with only the final LP delegated to the solver under test's *brute-force
    oracle* for small supports.
    """
    d1 = [t for t in doc1 if t in vecs]
    d2 = [t for t in doc2 if t in vecs]
    if not d1 or not d2:
        return math.inf
    u1, u2 = sorted(set(d1)), sorted(set(d2))
    if len(set(u1) | set(u2)) == 1:
        return 0.0
    v1 = np.array([vecs[t] for t in u1])
    v2 = np.array([vecs[t] for t in u2])
    cost = np.sqrt(((v1[:, None, :] - v2[None, :, :]) ** 2).sum(axis=2))
    if abs(cost).sum() < 1e-8:
        return math.inf
    a = np.array([d1.count(t) / len(d1) for t in u1])
    b = np.array([d2.count(t) / len(d2) for t in u2])
    return emd_bruteforce(a, b, cost)


def _hash_vecs(spark, tokens, dim=DIM):
    df = spark.createDataFrame([(t,) for t in sorted(tokens)], "token string")
    rows = W.with_hash_vectors(df, dim=dim).collect()
    return {r["token"]: np.array([r[f"v{d}"] for d in range(dim)])
            for r in rows}


@pytest.fixture(scope="module")
def nbows(spark):
    docs = docs_df(spark, COMMON_TEXTS)
    token_rows = docs.select("doc_id", F.explode("tokens").alias("token"))
    doc_nbow = W.nbow(token_rows, dim=DIM).cache()
    queries = {0: ["human", "computer", "system"], 1: ["graph", "trees"]}
    q_rows = spark.createDataFrame(
        [(qid, t) for qid, toks in queries.items() for t in toks],
        "query_id long, token string")
    query_nbow = (W.nbow(q_rows, id_col="query_id", dim=DIM)
                  .withColumnRenamed("doc_id", "query_id").cache())
    return doc_nbow, query_nbow, queries


def test_hash_vectors_unit_norm(spark):
    vecs = _hash_vecs(spark, {"human", "graph", "eps"})
    for v in vecs.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-12)


def test_exact_wmd_matches_local_reference(spark, nbows):
    doc_nbow, query_nbow, queries = nbows
    all_tokens = {t for d in COMMON_TEXTS for t in d}
    for toks in queries.values():
        all_tokens |= set(toks)
    vecs = _hash_vecs(spark, all_tokens)

    cand = spark.createDataFrame(
        [(q, d) for q in queries for d in range(len(COMMON_TEXTS))],
        "query_id long, doc_id long")
    got = {(r["query_id"], r["doc_id"]): r["wmd"]
           for r in W.wmd_pairs(doc_nbow, query_nbow, cand, dim=DIM).collect()}
    assert len(got) == 2 * len(COMMON_TEXTS)
    for qid, toks in queries.items():
        for did, doc in enumerate(COMMON_TEXTS):
            want = _local_wmdistance(toks, doc, vecs)
            assert got[(qid, did)] == pytest.approx(want, abs=1e-8), (qid, did)


def test_wmd_identity_and_inf_edges(spark):
    docs = docs_df(spark, COMMON_TEXTS)
    token_rows = docs.select("doc_id", F.explode("tokens").alias("token"))
    doc_nbow = W.nbow(token_rows, dim=DIM)
    # doc 3 vs itself as the query -> 0; 'trees' vs doc 5 (['trees']) -> union==1 -> 0
    q_rows = spark.createDataFrame(
        [(0, t) for t in COMMON_TEXTS[3]] + [(1, "trees")],
        "query_id long, token string")
    q_nbow = (W.nbow(q_rows, id_col="query_id", dim=DIM)
              .withColumnRenamed("doc_id", "query_id"))
    cand = spark.createDataFrame([(0, 3), (1, 5)], "query_id long, doc_id long")
    got = {(r["query_id"], r["doc_id"]): r["wmd"]
           for r in W.wmd_pairs(doc_nbow, q_nbow, cand, dim=DIM).collect()}
    assert got[(0, 3)] == pytest.approx(0.0, abs=1e-12)
    assert got[(1, 5)] == 0.0

    # vocab-restricted vectors: a query that is entirely OOV -> inf
    vocab = spark.createDataFrame(
        [(t,) for d in COMMON_TEXTS for t in d], "token string").distinct()
    vectors = W.with_hash_vectors(vocab, dim=DIM)
    oov_rows = spark.createDataFrame([(9, "zzznotavocabword")],
                                     "query_id long, token string")
    oov_nbow = (W.nbow(oov_rows, vectors=vectors, id_col="query_id", dim=DIM)
                .withColumnRenamed("doc_id", "query_id"))
    cand = spark.createDataFrame([(9, 0)], "query_id long, doc_id long")
    doc_nbow_v = W.nbow(token_rows, vectors=vectors, dim=DIM)
    out = W.wmd_pairs(doc_nbow_v, oov_nbow, cand, dim=DIM).collect()
    assert len(out) == 1 and math.isinf(out[0]["wmd"])


def test_rwmd_lower_bounds_wmd_and_topk_exact(spark, nbows):
    doc_nbow, query_nbow, queries = nbows
    cand = spark.createDataFrame(
        [(q, d) for q in queries for d in range(len(COMMON_TEXTS))],
        "query_id long, doc_id long")
    exact = {(r["query_id"], r["doc_id"]): r["wmd"]
             for r in W.wmd_pairs(doc_nbow, query_nbow, cand, dim=DIM).collect()}
    lower = {(r["query_id"], r["doc_id"]): r["rwmd"]
             for r in W.rwmd(doc_nbow, query_nbow, dim=DIM).collect()}
    assert set(lower) == set(exact)
    for key, lo in lower.items():
        assert lo <= exact[key] + 1e-9, key

    k = 3
    got = sorted((r["query_id"], r["rank"], r["doc_id"],
                  round(r["wmd"], 9))
                 for r in W.wmd_topk(doc_nbow, query_nbow, k=k,
                                     dim=DIM).collect())
    want = []
    for qid in queries:
        full = sorted(((v, d) for (q, d), v in exact.items() if q == qid))
        want += [(qid, i + 1, d, round(v, 9))
                 for i, (v, d) in enumerate(full[:k])]
    assert got == sorted(want)


def test_wmd_similarity_is_reciprocal_rank(spark, nbows):
    doc_nbow, query_nbow, _ = nbows
    topk = {(r["query_id"], r["doc_id"]): r["wmd"]
            for r in W.wmd_topk(doc_nbow, query_nbow, k=4, dim=DIM).collect()}
    sim = W.wmd_similarity_topk(doc_nbow, query_nbow, num_best=4,
                                dim=DIM).collect()
    assert len(sim) == len(topk)
    for r in sim:
        want = 1.0 / (1.0 + topk[(r["query_id"], r["doc_id"])])
        assert r["similarity"] == pytest.approx(want, rel=1e-12)


def test_rwmd_compiled_matches_relational(spark, nbows):
    """The expression-compiled fast path (one hash-agg, no join) and the
    relational fallback are the same bound."""
    doc_nbow, query_nbow, _ = nbows
    fast = {(r["query_id"], r["doc_id"]): r["rwmd"]
            for r in W.rwmd(doc_nbow, query_nbow, dim=DIM).collect()}
    slow = {(r["query_id"], r["doc_id"]): r["rwmd"]
            for r in W._rwmd_relational(doc_nbow, query_nbow,
                                        dim=DIM).collect()}
    assert set(fast) == set(slow)
    for k, v in fast.items():
        assert v == pytest.approx(slow[k], rel=1e-12, abs=1e-12), k
    # the threshold knob actually routes to the fallback
    forced = {(r["query_id"], r["doc_id"]): r["rwmd"]
              for r in W.rwmd(doc_nbow, query_nbow, dim=DIM,
                              max_compiled_tokens=0).collect()}
    assert forced == slow


def test_wmd_similarity_facade(spark):
    from gensim_spark import api

    docs = docs_df(spark, COMMON_TEXTS)
    index = api.WmdSimilarity(docs, num_best=3, dim=DIM)
    out = index[["human", "computer", "system"]].collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    # best match should be a doc sharing those tokens, and sims in (0, 1]
    assert all(0.0 < r["similarity"] <= 1.0 for r in out)
    best = min(out, key=lambda r: r["rank"])
    assert set(COMMON_TEXTS[best["doc_id"]]) & {"human", "computer", "system"}


def test_rwmd_duckdb_oracle_bit_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    texts = [" ".join(d) for d in COMMON_TEXTS]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    q = {0: "human computer system", 1: "graph trees"}
    want = {tuple(r) for r in con.execute(
        W.rwmd_topk_sql(q, k=5, dim=DIM)).fetchall()}

    docs = docs_df(spark, COMMON_TEXTS)
    token_rows = docs.select("doc_id", F.explode("tokens").alias("token"))
    doc_nbow = W.nbow(token_rows, dim=DIM)
    q_rows = spark.createDataFrame(
        [(qid, t) for qid, text in q.items() for t in text.split()],
        "query_id long, token string")
    q_nbow = (W.nbow(q_rows, id_col="query_id", dim=DIM)
              .withColumnRenamed("doc_id", "query_id"))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.col("rwmd").asc(),
                                               F.col("doc_id").asc())
    got = {(r["query_id"], r["doc_id"], r["rwmd"], r["rank"])
           for r in (W.rwmd(doc_nbow, q_nbow, dim=DIM)
                     .withColumn("rwmd", F.round("rwmd", 6))
                     .withColumn("rank", F.row_number().over(w))
                     .filter(F.col("rank") <= 5)).collect()}
    assert got == want
