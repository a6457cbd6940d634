"""LSI (operators/lsi.py) vs numpy's exact SVD.

With ℓ = k + extra_dims ≥ rank(A) the randomized range finder captures the
full column space, so the distributed result must equal numpy's exact
truncated SVD up to per-topic sign — these are strict parity tests, not
subspace-angle approximations (see the module docstring's exactness note).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import lsi as L
from tests.conftest import docs_df

K = 5


@pytest.fixture(scope="module")
def lsi_fixture(spark, common_texts):
    from gensim_spark import api

    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    postings = (dct.doc2bow(docs)
                .select("doc_id", "term_id",
                        F.col("tf").cast("double").alias("weight"))
                .cache())
    n_docs, n_terms = len(common_texts), len(dct)
    dense = np.zeros((n_docs, n_terms))
    for r in postings.collect():
        dense[r["doc_id"], r["term_id"]] = r["weight"]
    rank = np.linalg.matrix_rank(dense)
    proj = L.lsi_fit(postings, num_topics=K, extra_dims=rank + 2 - K,
                     power_iters=2)
    return postings, dense, proj


def test_singular_values_match_numpy(lsi_fixture):
    _, dense, proj = lsi_fixture
    s_np = np.linalg.svd(dense, compute_uv=False)[:K]
    assert proj.s == pytest.approx(s_np, rel=1e-8)


def test_u_matches_numpy_up_to_sign(lsi_fixture):
    _, dense, proj = lsi_fixture
    _, s_np, vt = np.linalg.svd(dense, full_matrices=False)
    u_got = np.zeros((dense.shape[1], K))
    for r in proj.u.collect():
        for i in range(K):
            u_got[r["term_id"], i] = r[f"t{i}"]
    # columns orthonormal
    assert np.allclose(u_got.T @ u_got, np.eye(K), atol=1e-8)
    # each topic is ± the exact right singular vector (σ distinct here)
    gaps = np.diff(s_np[:K + 1])
    for i in range(K):
        if i and abs(gaps[i - 1]) < 1e-9:
            continue  # degenerate pair — direction not unique
        dot = abs(u_got[:, i] @ vt[i, :])
        assert dot == pytest.approx(1.0, abs=1e-8), f"topic {i}"


def test_doc_topics_matches_numpy(lsi_fixture):
    postings, dense, proj = lsi_fixture
    got = np.zeros((dense.shape[0], K))
    for r in L.doc_topics(postings, proj).collect():
        got[r["doc_id"], r["topic_id"]] = r["weight"]
    # uᵀ·x computed with OUR u must equal the dense product exactly
    u_got = np.zeros((dense.shape[1], K))
    for r in proj.u.collect():
        for i in range(K):
            u_got[r["term_id"], i] = r[f"t{i}"]
    assert np.allclose(got, dense @ u_got, atol=1e-8)
    # and |values| equal the exact SVD projection (sign per topic free)
    _, _, vt = np.linalg.svd(dense, full_matrices=False)
    want = dense @ vt[:K].T
    assert np.allclose(np.abs(got), np.abs(want), atol=1e-7)


def test_scaled_doc_topics(lsi_fixture):
    postings, _, proj = lsi_fixture
    plain = {(r["doc_id"], r["topic_id"]): r["weight"]
             for r in L.doc_topics(postings, proj).collect()}
    scaled = {(r["doc_id"], r["topic_id"]): r["weight"]
              for r in L.doc_topics(postings, proj, scaled=True).collect()}
    for (d, t), v in plain.items():
        assert scaled[(d, t)] == pytest.approx(v / proj.s[t], rel=1e-10)


def test_show_topic_and_facade(spark, common_texts, lsi_fixture):
    from gensim_spark import api

    postings, _, proj = lsi_fixture
    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    top = L.show_topic(proj, dct.df, 0, topn=3).collect()
    assert len(top) == 3
    # ranked by |value| desc
    vals = [abs(r["value"]) for r in top]
    assert vals == sorted(vals, reverse=True)

    model = api.LsiModel(dct.doc2bow(docs), num_topics=3, extra_dims=9,
                         weight_col="tf")
    out = model[dct.doc2bow(docs)]
    assert out.columns == ["doc_id", "topic_id", "weight"]
    assert out.count() == len(common_texts) * 3
    assert len(model.projection.s) == 3
