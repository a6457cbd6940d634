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


def _dense_from_postings(rows, n_docs, n_terms):
    dense = np.zeros((n_docs, n_terms))
    for r in rows:
        dense[r["doc_id"], r["term_id"]] = r["weight"]
    return dense


def _collect_u(proj, n_terms):
    k = proj.num_topics
    u = np.zeros((n_terms, k))
    for r in proj.u.collect():
        for i in range(k):
            u[r["term_id"], i] = r[f"t{i}"]
    return u


def _ref_merge(u1, s1, u2, s2, k, decay=1.0):
    """numpy replica of Projection.merge (lsimodel.py:242-332)."""
    n1, n2 = u1.shape[1], u2.shape[1]
    c = u1.T @ u2
    comp = u2 - u1 @ c
    q, r = np.linalg.qr(comp)
    km = np.zeros((n1 + n2, n1 + n2))
    km[:n1, :n1] = np.diag(decay * s1)
    km[:n1, n1:] = c * s2[np.newaxis, :]
    km[n1:, n1:] = r * s2[np.newaxis, :]
    u_k, s_k, _ = np.linalg.svd(km, full_matrices=False)
    kc = L.clip_spectrum(s_k ** 2, k)
    u_new = u1 @ u_k[:n1, :kc] + q @ u_k[n1:, :kc]
    for i in range(kc):
        if u_new[0, i] < 0.0:
            u_new[:, i] *= -1.0
    return u_new, s_k[:kc]


def test_merge_projections_matches_reference_replica(spark, common_texts):
    """merge(P(A1), P(A2)) ≡ the reference's Projection.merge run in numpy
    on the same inputs, and — at full rank — ≡ one-shot SVD of [A1; A2]."""
    from gensim_spark import api

    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    post = (dct.doc2bow(docs)
            .select("doc_id", "term_id",
                    F.col("tf").cast("double").alias("weight")).cache())
    n_terms = len(dct)
    p_a = post.filter("doc_id < 5")
    p_b = post.filter("doc_id >= 5")
    da = _dense_from_postings(p_a.collect(), 9, n_terms)
    db = _dense_from_postings(p_b.collect(), 9, n_terms)
    ra, rb = np.linalg.matrix_rank(da), np.linalg.matrix_rank(db)
    # full-rank half decompositions: the streamed merge is then EXACT
    # (truncated halves lose mass, as in the reference)
    k = max(ra, rb)

    pa = L.lsi_fit(p_a, num_topics=k, extra_dims=2, power_iters=3)
    pb = L.lsi_fit(p_b, num_topics=k, extra_dims=2, power_iters=3)
    merged = L.merge_projections(pa, pb)

    u1, u2 = _collect_u(pa, n_terms), _collect_u(pb, n_terms)
    want_u, want_s = _ref_merge(u1, pa.s, u2, pb.s, k)
    got_u = _collect_u(merged, n_terms)
    assert merged.s == pytest.approx(want_s, rel=1e-7)
    # columns may differ by sign only where the canonicalizing row is 0
    for i in range(merged.num_topics):
        col, ref = got_u[:, i], want_u[:, i]
        assert min(np.abs(col - ref).max(),
                   np.abs(col + ref).max()) < 1e-7

    # full-rank cross-check: singular values of the stacked corpus
    s_np = np.linalg.svd(np.vstack([da, db]), compute_uv=False)
    assert merged.s == pytest.approx(s_np[:merged.num_topics], rel=1e-6)


def test_merge_projections_decay_and_empty(spark, common_texts):
    from gensim_spark import api

    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    post = (dct.doc2bow(docs)
            .select("doc_id", "term_id",
                    F.col("tf").cast("double").alias("weight")).cache())
    n_terms = len(dct)
    p_a, p_b = post.filter("doc_id < 5"), post.filter("doc_id >= 5")
    k = 3
    pa = L.lsi_fit(p_a, num_topics=k, extra_dims=4, power_iters=3)
    pb = L.lsi_fit(p_b, num_topics=k, extra_dims=4, power_iters=3)
    half = L.merge_projections(pa, pb, decay=0.5)
    u1, u2 = _collect_u(pa, n_terms), _collect_u(pb, n_terms)
    want_u, want_s = _ref_merge(u1, pa.s, u2, pb.s, k, decay=0.5)
    assert half.s == pytest.approx(want_s, rel=1e-7)
    got_u = _collect_u(half, n_terms)
    for i in range(half.num_topics):
        col, ref = got_u[:, i], want_u[:, i]
        assert min(np.abs(col - ref).max(),
                   np.abs(col + ref).max()) < 1e-7


def test_add_documents_online_equals_batch_spectrum(spark, common_texts):
    """add_documents over two halves reproduces the batch spectrum at full
    rank (the streamed-SVD guarantee the reference's algorithm carries)."""
    from gensim_spark import api

    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    post = (dct.doc2bow(docs)
            .select("doc_id", "term_id",
                    F.col("tf").cast("double").alias("weight")).cache())
    n_terms = len(dct)
    dense = _dense_from_postings(post.collect(), 9, n_terms)
    # full-rank halves: streamed == batch exactly (truncated halves drop
    # mass, as in the reference's own algorithm)
    k = max(np.linalg.matrix_rank(dense[:5]),
            np.linalg.matrix_rank(dense[5:]))
    pa = L.lsi_fit(post.filter("doc_id < 5"), num_topics=k, extra_dims=5,
                   power_iters=3)
    upd = L.add_documents(pa, post.filter("doc_id >= 5"), extra_dims=5,
                          power_iters=3)
    s_np = np.linalg.svd(dense, compute_uv=False)
    assert upd.s == pytest.approx(s_np[:upd.num_topics], rel=1e-6)
    # the updated projection folds new docs in: doc_topics runs at new rank
    dt = L.doc_topics(post, upd)
    assert dt.count() == 9 * upd.num_topics


def test_merge_no_ratchet_and_rank_deficient_stability(spark, common_texts):
    """A low-rank early chunk must not permanently cap num_topics
    (k_requested survives clipping), and merging a chunk that lies inside
    the existing subspace (singular orthogonal-component Gram) stays
    numerically bounded via the pseudo-inverse QR."""
    from gensim_spark import api

    docs = docs_df(spark, common_texts)
    dct = api.Dictionary(docs)
    post = (dct.doc2bow(docs)
            .select("doc_id", "term_id",
                    F.col("tf").cast("double").alias("weight")).cache())
    k = 6
    # first chunk: 2 docs → rank ≤ 2, clip fires
    p = L.lsi_fit(post.filter("doc_id < 2"), num_topics=k, extra_dims=3,
                  power_iters=3)
    assert getattr(p, "k_requested") == k
    p = L.add_documents(p, post.filter("doc_id >= 2 and doc_id < 5"),
                        extra_dims=3, power_iters=3)
    p = L.add_documents(p, post.filter("doc_id >= 5"), extra_dims=3,
                        power_iters=3)
    # rank grew back past the first chunk's rank — no ratchet at 2
    assert p.num_topics > 2
    assert p.k_requested == k

    # rank-deficient merge: re-add documents the projection already spans
    p2 = L.add_documents(p, post.filter("doc_id < 3"), extra_dims=3,
                         power_iters=3)
    u = _collect_u(p2, post.agg(F.max("term_id")).first()[0] + 1)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 10.0   # no 1/sqrt(eps) blow-up
    # basis stays orthonormal within tolerance
    gram = u.T @ u
    np.testing.assert_allclose(gram, np.eye(p2.num_topics), atol=1e-6)
