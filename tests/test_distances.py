"""Distance kernels (matutils.py:796-1029) + LdaModel.diff (ldamodel.py:1420).

The scalar layer is pinned against hand-derived goldens of the reference
formulas; the relational pairwise kernel is pinned against the scalar layer
on randomized sparse vectors (including empty / disjoint / identical edge
cases); lda_diff against an independent cell-by-cell recomputation.
"""

import math

import numpy as np
import pytest

from gensim_spark.operators import distances as D


def _rand_bow(rng, max_id=30, max_len=12):
    n = int(rng.integers(0, max_len))
    ids = rng.choice(max_id, size=n, replace=False)
    return [(int(i), float(rng.uniform(0.1, 5.0))) for i in sorted(ids)]


# --- scalars -------------------------------------------------------------------

def test_cossim_golden():
    v1 = [(0, 1.0), (1, 2.0)]
    v2 = [(1, 1.0), (2, 2.0)]
    # dot=2, |v1|=sqrt5, |v2|=sqrt5
    assert D.cossim(v1, v2) == pytest.approx(2.0 / 5.0)
    assert D.cossim([], v2) == 0.0
    assert D.cossim(v1, []) == 0.0
    assert D.cossim(v1, v1) == pytest.approx(1.0)


def test_hellinger_jaccard_golden():
    v1 = [(0, 1.0), (1, 4.0)]
    v2 = [(1, 1.0), (2, 1.0)]
    # hellinger: 0.5*((1-0)^2 + (2-1)^2 + (0-1)^2) = 1.5
    assert D.hellinger_bow(v1, v2) == pytest.approx(math.sqrt(1.5))
    # jaccard: inter = min(4,1)=1; union = 5 + 2
    assert D.jaccard_bow(v1, v2) == pytest.approx(1.0 - 1.0 / 7.0)
    assert D.jaccard_distance({1, 2}, {2, 3}) == pytest.approx(1 - 1 / 3)
    assert D.jaccard_distance(set(), set()) == 1.0


def test_kl_js_golden_and_inf():
    p = np.array([0.5, 0.5, 0.0])
    q = np.array([0.25, 0.5, 0.25])
    want = 0.5 * math.log(0.5 / 0.25) + 0.5 * math.log(0.5 / 0.5)
    assert D.kullback_leibler(p, q) == pytest.approx(want)
    # unnormalized inputs are renormalized (scipy.stats.entropy)
    assert D.kullback_leibler(2 * p, 3 * q) == pytest.approx(want)
    # q has a zero where p > 0 → +inf, never a crash
    assert D.kullback_leibler(q, p) == float("inf")
    # JS is finite, symmetric, and zero on identical distributions
    assert D.jensen_shannon(p, q) == pytest.approx(D.jensen_shannon(q, p))
    assert D.jensen_shannon(p, p) == pytest.approx(0.0)
    assert np.isfinite(D.jensen_shannon(q, p))
    # golden: JS(p,q) with m=(p+q)/2
    m = 0.5 * (p + q)
    want_js = 0.5 * (sum(pi * math.log(pi / mi)
                         for pi, mi in zip(p, m) if pi > 0)
                     + sum(qi * math.log(qi / mi)
                           for qi, mi in zip(q, m) if qi > 0))
    assert D.jensen_shannon(p, q) == pytest.approx(want_js)


# --- relational kernel vs scalars ----------------------------------------------

def _postings_df(spark, vecs, id_col="doc_id"):
    rows = [(i, t, w) for i, bow in enumerate(vecs) for t, w in bow]
    return spark.createDataFrame(rows,
                                 f"{id_col} long, term_id long, weight double")


def test_pairwise_matches_scalars(spark):
    rng = np.random.default_rng(7)
    vecs = [_rand_bow(rng) for _ in range(14)]
    vecs[3] = []                      # empty side
    vecs[5] = [(40, 1.0), (41, 2.0)]  # disjoint from most
    vecs[6] = vecs[2]                 # identical pair
    df = _postings_df(spark, vecs)
    pair_list = [(k, a, b) for k, (a, b) in enumerate(
        [(0, 1), (2, 6), (3, 1), (5, 0), (4, 4), (7, 8), (9, 10)])]
    pairs = spark.createDataFrame(pair_list, "pair_id long, id_a long, id_b long")
    got = {r["pair_id"]: r for r in D.pairwise_bow_distances(
        pairs, df, df, metrics=D.METRICS).collect()}
    V = 50
    for k, a, b in pair_list:
        r = got[k]
        assert r["cossim"] == pytest.approx(D.cossim(vecs[a], vecs[b]),
                                            abs=1e-12)
        assert r["hellinger"] == pytest.approx(
            D.hellinger_bow(vecs[a], vecs[b]), abs=1e-12)
        if vecs[a] or vecs[b]:
            assert r["jaccard"] == pytest.approx(
                D.jaccard_bow(vecs[a], vecs[b]), abs=1e-12)
        if vecs[a] and vecs[b]:
            dense_a = np.zeros(V)
            dense_b = np.zeros(V)
            for t, w in vecs[a]:
                dense_a[t] = w
            for t, w in vecs[b]:
                dense_b[t] = w
            kl = D.kullback_leibler(dense_a, dense_b)
            if math.isinf(kl):
                assert math.isinf(r["kullback_leibler"])
            else:
                assert r["kullback_leibler"] == pytest.approx(kl, abs=1e-12)
            assert r["jensen_shannon"] == pytest.approx(
                D.jensen_shannon(dense_a, dense_b), abs=1e-12)


def test_pairwise_unknown_metric_raises(spark):
    pairs = spark.createDataFrame([(0, 0, 1)],
                                  "pair_id long, id_a long, id_b long")
    df = _postings_df(spark, [[(0, 1.0)], [(0, 2.0)]])
    with pytest.raises(ValueError):
        D.pairwise_bow_distances(pairs, df, df, metrics=("nope",))


# --- lda diff -------------------------------------------------------------------

def _rand_topics(rng, k, v):
    t = rng.uniform(0.01, 1.0, size=(k, v))
    return t / t.sum(axis=1, keepdims=True)


@pytest.mark.parametrize("distance", ["kullback_leibler", "hellinger",
                                      "jensen_shannon", "jaccard"])
def test_lda_diff_matches_cellwise(distance):
    rng = np.random.default_rng(11)
    t1, t2 = _rand_topics(rng, 3, 8), _rand_topics(rng, 4, 8)
    z, ann = D.lda_diff(t1, t2, distance=distance, num_words=4,
                        n_ann_terms=2, normed=False)
    assert z.shape == (3, 4)
    fst = [set(np.argsort(-t1[i], kind="stable")[:4].tolist())
           for i in range(3)]
    snd = [set(np.argsort(-t2[j], kind="stable")[:4].tolist())
           for j in range(4)]
    for i in range(3):
        for j in range(4):
            if distance == "kullback_leibler":
                want = D.kullback_leibler(t1[i], t2[j])
            elif distance == "hellinger":
                want = math.sqrt(0.5 * ((np.sqrt(t1[i]) -
                                         np.sqrt(t2[j])) ** 2).sum())
            elif distance == "jensen_shannon":
                want = D.jensen_shannon(t1[i], t2[j])
            else:
                want = D.jaccard_distance(fst[i], snd[j])
            assert z[i, j] == pytest.approx(want, abs=1e-12)
            pos, neg = ann[i, j]
            assert set(pos) <= (fst[i] & snd[j]) and len(pos) <= 2
            assert set(neg) <= (fst[i] ^ snd[j]) and len(neg) <= 2
    # normed divides by the max
    zn, _ = D.lda_diff(t1, t2, distance=distance, num_words=4, normed=True)
    np.testing.assert_allclose(zn, z / np.max(z), atol=1e-12)


def test_lda_diff_diagonal():
    rng = np.random.default_rng(3)
    t1, t2 = _rand_topics(rng, 3, 6), _rand_topics(rng, 3, 6)
    z, ann = D.lda_diff(t1, t2, distance="hellinger", diagonal=True,
                        normed=False)
    zf, _ = D.lda_diff(t1, t2, distance="hellinger", diagonal=False,
                       normed=False)
    np.testing.assert_allclose(z, np.diag(zf), atol=1e-12)
    with pytest.raises(ValueError):
        D.lda_diff(t1, t2, distance="euclidean")


def test_topic_diff_df_matches_driver(spark):
    rng = np.random.default_rng(5)
    t1, t2 = _rand_topics(rng, 3, 10), _rand_topics(rng, 3, 10)
    want, _ = D.lda_diff(t1, t2, distance="hellinger", annotation=False,
                         normed=True)
    da = D.topic_postings(spark, t1)
    db = D.topic_postings(spark, t2)
    rows = D.topic_diff_df(spark, da, db, distance="hellinger",
                           normed=True).collect()
    got = np.zeros((3, 3))
    for r in rows:
        got[r["topic_a"], r["topic_b"]] = r["d"]
    np.testing.assert_allclose(got, want, atol=1e-10)


# --- lda surface: get_term_topics / top_topics / diff ---------------------------

def test_lda_term_topics_and_top_topics(spark, common_texts):
    from gensim_spark.operators import lda as LD
    from gensim_spark.operators import vocab as V, bow as B
    from tests.conftest import docs_df

    docs = docs_df(spark, common_texts)
    vocab = V.build_vocab(docs).cache()
    postings = B.doc2bow_postings(docs, vocab)
    model = LD.lda_fit(postings, num_topics=2,
                       num_terms=vocab.count(), passes=2, random_seed=7)

    tt = LD.get_term_topics(model, 0, minimum_probability=0.0)
    eeb = np.exp(model.get_elogbeta())
    assert tt == [(k, pytest.approx(float(eeb[k, 0]))) for k in range(2)]
    # a high threshold filters
    assert LD.get_term_topics(model, 0, minimum_probability=1.1) == []

    top = LD.top_topics(model, measure="u_mass", topn=5,
                        postings=postings, num_docs=9)
    assert len(top) == 2
    # sorted best-first
    assert top[0][1] >= top[1][1]
    reprs, score = top[0]
    assert len(reprs) == 5 and all(isinstance(p, float) for p, _ in reprs)

    z, ann = LD.diff(model, model, distance="jensen_shannon", num_words=5)
    # self-diff: diagonal is exactly zero pre-norming; matrix is K×K
    assert z.shape == (2, 2)
    assert z[0, 0] == pytest.approx(0.0, abs=1e-12)
    assert z[1, 1] == pytest.approx(0.0, abs=1e-12)


def test_pairwise_fully_absent_pair_matches_scalars(spark):
    """A pair with no postings on EITHER side: cossim and hellinger answer
    their two-empty-bows scalar value 0.0; jaccard/KL/JS stay NULL
    (undefined)."""
    df = _postings_df(spark, [[(0, 1.0)]])
    pairs = spark.createDataFrame([(0, 7, 8)],
                                  "pair_id long, id_a long, id_b long")
    r = D.pairwise_bow_distances(pairs, df, df, metrics=D.METRICS).collect()[0]
    assert r["cossim"] == 0.0
    assert r["hellinger"] == D.hellinger_bow([], []) == 0.0
    assert r["jaccard"] is None
    assert r["kullback_leibler"] is None
