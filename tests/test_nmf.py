"""NMF parity vs a sequential replica + kernel ports of the reference.

The coordinate-descent kernel is pinned against a direct python port of
nmf_pgd.pyx:19-63; the distributed fit is pinned against a driver-only
replica that computes the batch sufficient statistics with plain numpy over
the full corpus (same seeds, same per-document stop), so the mapInPandas
partial assembly and the packed-row reduce are what is actually under test.
"""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import nmf as N


def port_solve_h(h, Wtv, WtW, permutation, kappa):
    """Direct per-sample port of nmf_pgd.pyx solve_h (sequential loops)."""
    n_components, n_samples = h.shape
    violation = 0.0
    for s in range(n_samples):
        for c_raw in range(n_components):
            c = permutation[c_raw]
            grad = -Wtv[c, s]
            for c2 in range(n_components):
                grad += WtW[c, c2] * h[c2, s]
            hessian = WtW[c, c]
            grad = grad * kappa / hessian
            pg = min(0.0, grad) if h[c, s] == 0 else grad
            violation += pg * pg
            h[c, s] = max(h[c, s] - grad, 0.0)
    return math.sqrt(violation)


def rand_bow(rng, n_docs=80, vocab=40, max_nnz=12):
    docs = []
    for _ in range(n_docs):
        nnz = rng.integers(1, max_nnz)
        ids = np.sort(rng.choice(vocab, size=nnz, replace=False))
        cts = rng.integers(1, 6, size=nnz).astype(np.float64)
        docs.append((ids.astype(np.int64), cts))
    return docs


def replica_fit(bow_docs, vocab, k, passes=1, seed=13, kappa=1.0,
                h_max_iter=50, h_stop=1e-3, w_max_iter=200, w_stop=1e-4):
    """Driver-only fit: numpy sufficient statistics over the full corpus."""
    model = N.NmfModel(vocab, k, kappa, 0.01, w_max_iter, w_stop,
                       h_max_iter, h_stop, True, seed)
    total = sum(float(c.sum()) for _, c in bow_docs)
    model.setup(total / (vocab * len(bow_docs)))
    model.v_max = max(float(c.max()) for _, c in bow_docs)
    for pass_ in range(passes):
        perms = N.make_perms(k, seed, pass_, h_max_iter)
        Wt = model.W.T
        WtW = Wt @ model.W
        hh = np.zeros((k, k))
        vh = np.zeros((vocab, k))
        for ids, cts in bow_docs:
            Wtv = (Wt[:, ids] @ cts).reshape(-1, 1)
            h = N.solveproj_block(WtW, Wtv, vocab, kappa, h_stop, perms)[:, 0]
            hh += np.outer(h, h)
            vh[ids, :] += cts[:, None] * h
        model.fold_batch(hh, vh)
    return model


def bow_to_df(spark, bow_docs):
    rows = [(d, int(t), float(c)) for d, (ids, cts) in enumerate(bow_docs)
            for t, c in zip(ids, cts)]
    return spark.createDataFrame(rows, "doc_id long, term_id long, tf double")


def test_solve_h_block_matches_pyx_port():
    rng = np.random.default_rng(0)
    k, n = 6, 9
    W = np.abs(rng.normal(size=(30, k)))
    WtW = W.T @ W
    Wtv = np.abs(rng.normal(size=(k, n)))
    perm = rng.permutation(k).astype(np.int64)
    h1 = np.abs(rng.normal(size=(k, n)))
    h1[rng.random(size=h1.shape) < 0.3] = 0.0
    h2 = h1.copy()

    viol_vec = N.solve_h_block(h1, Wtv, WtW, perm, 1.0)
    viol_ref = port_solve_h(h2, Wtv, WtW, perm, 1.0)
    np.testing.assert_allclose(h1, h2, rtol=0, atol=0)
    assert math.sqrt(viol_vec.sum()) == pytest.approx(viol_ref, rel=1e-12)


def test_w_init_deterministic_halfnorm():
    m = N.NmfModel(20, 4, 1.0, 0.01, 200, 1e-4, 50, 1e-3, True, 42)
    m.setup(0.5)
    rs = np.random.RandomState(42)
    want = m.w_std * np.abs(rs.standard_normal((20, 4)))
    np.testing.assert_allclose(m.W, want)
    assert (m.W >= 0).all()


def test_nmf_fit_matches_replica(spark):
    rng = np.random.default_rng(11)
    bow = rand_bow(rng, n_docs=60, vocab=25)
    postings = bow_to_df(spark, bow).repartition(5)

    for passes in (1, 2):
        want = replica_fit(bow, 25, 4, passes=passes)
        got = N.nmf_fit(postings, num_topics=4, num_terms=25, passes=passes)
        np.testing.assert_allclose(got.W, want.W, atol=1e-10)
        np.testing.assert_allclose(got.A, want.A, atol=1e-10)
        np.testing.assert_allclose(got.B, want.B, atol=1e-10)
        assert got.v_max == want.v_max
        assert got.w_std == pytest.approx(want.w_std)


def test_doc_topics_matches_replica_transform(spark):
    rng = np.random.default_rng(21)
    bow = rand_bow(rng, n_docs=40, vocab=20)
    postings = bow_to_df(spark, bow).repartition(3)
    model = N.nmf_fit(postings, num_topics=3, num_terms=20, passes=1)

    got = {(r["doc_id"], r["topic_id"]): r["probability"]
           for r in N.doc_topics(postings, model).collect()}

    perms = N.make_perms(3, model.random_seed, N._TRANSFORM_UPDATE_NO,
                         model.h_max_iter)
    Wt = model.W.T
    WtW = Wt @ model.W
    n_kept = 0
    for d, (ids, cts) in enumerate(bow):
        Wtv = (Wt[:, ids] @ cts).reshape(-1, 1)
        h = N.solveproj_block(WtW, Wtv, 20, model.kappa,
                              model.h_stop_condition, perms)[:, 0]
        s = h.sum()
        if s:
            h = h / s
        for t in range(3):
            if h[t] > max(model.minimum_probability, 1e-8):
                assert got[(d, t)] == pytest.approx(h[t], rel=1e-12)
                n_kept += 1
    assert n_kept == len(got) and n_kept > 0


def test_get_topics_normalized_rows():
    rng = np.random.default_rng(2)
    m = N.NmfModel(15, 3, 1.0, 0.01, 200, 1e-4, 50, 1e-3, True, 7)
    m.setup(1.0)
    m.v_max = 5.0
    m.A = np.eye(3) * 0.1
    m.B = np.abs(rng.normal(size=(15, 3)))
    m.solve_w()
    topics = m.get_topics()
    np.testing.assert_allclose(topics.sum(axis=1), 1.0)
    raw = m.get_topics(normalize=False)
    assert raw.shape == (3, 15) and (raw >= 0).all()
    # column l2 norms capped at 1 by _transform
    assert (np.linalg.norm(m.W, axis=0) <= 1.0 + 1e-12).all()


def test_l2_norm_finite_and_decreasing_with_topics(spark):
    rng = np.random.default_rng(31)
    bow = rand_bow(rng, n_docs=50, vocab=20)
    postings = bow_to_df(spark, bow)
    m2 = N.nmf_fit(postings, num_topics=2, num_terms=20, passes=2)
    m8 = N.nmf_fit(postings, num_topics=8, num_terms=20, passes=2)
    e2, e8 = N.l2_norm(postings, m2), N.l2_norm(postings, m8)
    assert e2 >= 0 and e8 >= 0 and math.isfinite(e2) and math.isfinite(e8)
    assert e8 <= e2 * 1.05  # more factors can't reconstruct much worse


def test_nmf_facade(spark):
    from gensim_spark.api import Dictionary, Nmf
    from gensim_spark.functions import textprep
    from gensim_spark.operators import bow as B

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = textprep.tokenize_pages(docs, text_col="text") \
        .select("doc_id", "tokens")
    d = Dictionary(tok)
    postings = B.doc2bow_postings(tok, d.df).select("doc_id", "term_id", "tf")
    m = Nmf(postings, id2word=d, num_topics=3, passes=1)
    topics = m.get_topics()
    assert topics.shape[0] == 3
    np.testing.assert_allclose(topics.sum(axis=1), 1.0)
    st = m.show_topic(0, topn=5)
    assert len(st) == 5 and all(isinstance(t, str) for t, _ in st)
    dt = m[postings]
    assert dt.count() > 0
    pdf = dt.toPandas()
    assert (pdf["probability"] > 0).all()


def test_nmf_fit_weight_column_matches_tf(spark):
    # ADVICE r4: postings carrying a 'weight' column (corpus_bow's documented
    # fallback) must fit identically to the same values under 'tf' — the
    # setup aggregations resolve the column like lda.py:213 does.
    rng = np.random.default_rng(17)
    bow = rand_bow(rng, n_docs=30, vocab=15)
    postings = bow_to_df(spark, bow).repartition(3)
    want = N.nmf_fit(postings, num_topics=3, num_terms=15, passes=1)
    got = N.nmf_fit(postings.withColumnRenamed("tf", "weight"),
                    num_topics=3, num_terms=15, passes=1)
    np.testing.assert_allclose(got.W, want.W, atol=0)
    assert got.v_max == want.v_max
    assert got.w_std == pytest.approx(want.w_std)


def test_doc_factors_is_artifact_form_of_doc_topics(spark):
    rng = np.random.default_rng(21)
    bow = rand_bow(rng, n_docs=40, vocab=20)
    postings = bow_to_df(spark, bow).repartition(3)
    model = N.nmf_fit(postings, num_topics=3, num_terms=20, passes=1)

    h = {(r["doc_id"], r["topic_id"]): r["h"]
         for r in N.doc_factors(postings, model).collect()}
    assert len(h) == 40 * 3 and all(v >= 0 for v in h.values())
    sums = {}
    for (d, _), val in h.items():
        sums[d] = sums.get(d, 0.0) + val
    min_p = max(model.minimum_probability, 1e-8)
    want = {(d, t): val / sums[d] for (d, t), val in h.items()
            if sums[d] > 0 and val / sums[d] > min_p}
    got = {(r["doc_id"], r["topic_id"]): r["probability"]
           for r in N.doc_topics(postings, model).collect()}
    assert set(got) == set(want)
    for key in got:
        assert got[key] == pytest.approx(want[key], rel=1e-12)


def test_nmf_fit_infers_num_terms(spark):
    from gensim_spark.operators.nmf import nmf_fit

    postings = spark.createDataFrame(
        [(d, t, 1.0) for d in range(6) for t in range(4)],
        "doc_id long, term_id long, tf double")
    m = nmf_fit(postings, num_topics=2, passes=1)
    assert m.num_tokens == 4
