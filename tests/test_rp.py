"""Random projections (operators/rp.py) vs a pure-numpy replica.

The reference RpModel (gensim/models/rpmodel.py:50-155) projects with a ±1
matrix drawn from numpy's *global* RNG, so exact values are not reproducible
even by the reference itself; the contract tested here is the deterministic
hash-sign instantiation: the distributed matmul must equal a driver-side
numpy projection using the identical hash60-derived signs, with gensim's
zero-drop semantics (rpmodel.py:151-154)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.functions.hashing import hash60_py
from gensim_spark.operators import rp as RP
from tests.conftest import docs_df


def _numpy_rp(doc_vecs: dict[int, dict[int, int]], num_terms: int, k: int):
    proj = np.empty((k, num_terms), dtype=np.float64)
    for t in range(num_terms):
        for j in range(k):
            proj[j, t] = 1.0 if hash60_py(f"rp_{t}_{j}") % 2 == 1 else -1.0
    out = {}
    for doc, vec in doc_vecs.items():
        dense = np.zeros(num_terms)
        for t, tf in vec.items():
            dense[t] = tf
        topics = proj @ dense / math.sqrt(k)
        out[doc] = {j: v for j, v in enumerate(topics) if abs(v) > 1e-9}
    return out


@pytest.fixture(scope="module")
def rp_inputs(spark, common_texts):
    from gensim_spark import api

    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    postings = dct.doc2bow(docs).cache()
    doc_vecs = {}
    for r in postings.collect():
        doc_vecs.setdefault(r["doc_id"], {})[r["term_id"]] = r["tf"]
    return postings, doc_vecs, len(dct)


def test_rp_matches_numpy_replica(spark, rp_inputs):
    postings, doc_vecs, num_terms = rp_inputs
    k = 8
    want = _numpy_rp(doc_vecs, num_terms, k)
    got = {}
    for r in RP.rp_topics(postings, num_topics=k).collect():
        got.setdefault(r["doc_id"], {})[r["topic_id"]] = r["weight"]
    assert set(got) == set(want)
    for doc in want:
        assert set(got[doc]) == set(want[doc])
        for j, v in want[doc].items():
            assert got[doc][j] == pytest.approx(v, rel=1e-12)


def test_rp_exact_zero_rows_dropped(spark):
    """Two terms with equal tf and opposite signs on a topic cancel to an
    exact 0 and the row is dropped (gensim's allclose-zero filter)."""
    # find a topic where terms 0 and 1 have opposite signs
    k = 8
    signs = {(t, j): 1 if hash60_py(f"rp_{t}_{j}") % 2 == 1 else -1
             for t in (0, 1) for j in range(k)}
    opp = [j for j in range(k) if signs[(0, j)] != signs[(1, j)]]
    assert opp, "hash signs never differ across 8 topics — implausible"
    postings = spark.createDataFrame(
        [(0, 0, 3), (0, 1, 3)], "doc_id long, term_id long, tf long")
    got = {r["topic_id"] for r in
           RP.rp_topics(postings, num_topics=k).collect()}
    for j in opp:
        assert j not in got
    for j in range(k):
        if j not in opp:
            assert j in got


def test_rp_facade_and_linearity(spark, rp_inputs):
    """Facade surface + RP linearity: doubling every tf doubles every
    topic weight (the transform is a linear map)."""
    from gensim_spark import api

    postings, _, _ = rp_inputs
    model = api.RpModel(num_topics=4)
    base = {(r["doc_id"], r["topic_id"]): r["weight"]
            for r in model[postings].collect()}
    doubled = postings.withColumn("tf", F.col("tf") * 2)
    twice = {(r["doc_id"], r["topic_id"]): r["weight"]
             for r in api.RpModel(num_topics=4)[doubled].collect()}
    assert set(base) == set(twice)
    for key, v in base.items():
        assert twice[key] == pytest.approx(2 * v, rel=1e-12)
