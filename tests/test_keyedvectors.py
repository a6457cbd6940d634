"""KeyedVectors query surface vs a numpy replica of the reference kernels."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import keyedvectors as KV


@pytest.fixture(scope="module")
def kv_df(spark):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(50, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(50)],
        "vec_id long, embedding array<double>")
    return mat, df


def _unit(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def test_most_similar_matches_reference_kernel(kv_df):
    mat, df = kv_df
    # reference (keyedvectors.py:832-860): mean of unit inputs, unit mean,
    # dists = V·mean/‖V‖, inputs excluded
    pos, neg = [3, 7], [11]
    weights = np.array([1.0, 1.0, -1.0])
    mean = sum(w * _unit(mat[k]) for k, w in zip(pos + neg, weights))
    mean = _unit(mean / np.abs(weights).sum())
    dists = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ mean
    order = [i for i in sorted(range(50), key=lambda i: (-dists[i], i))
             if i not in pos + neg][:5]

    got = KV.most_similar(df, pos, neg, topn=5).collect()
    assert [r["vec_id"] for r in got] == order
    for r, want_i in zip(got, order):
        assert r["sim"] == pytest.approx(round(float(dists[want_i]), 6))


def test_most_similar_ensure_list_lone_key(kv_df, spark):
    """_ensure_list parity (reference keyedvectors.py:196-209): a lone key
    — int or string — is ONE key, not an iterable; a lone string must not
    be split into characters."""
    mat, df = kv_df
    want = [(r["vec_id"], r["sim"])
            for r in KV.most_similar(df, [3], topn=3).collect()]
    got = [(r["vec_id"], r["sim"])
           for r in KV.most_similar(df, 3, topn=3).collect()]
    assert got == want

    sdf = spark.createDataFrame(
        [("batch", [1.0, 0.0]), ("b", [0.0, 1.0]), ("join", [0.8, 0.6])],
        "token string, embedding array<double>")
    got = KV.most_similar(sdf, "batch", topn=2, key_col="token").collect()
    assert [r["token"] for r in got] == ["join", "b"]  # 'batch' excluded,
    # and the query resolved as the key 'batch', not chars b/a/t/c/h


def test_mean_vector_weights_and_flags(kv_df):
    mat, df = kv_df
    m = KV.mean_vector(df, [1, 2], weights=[2.0, 1.0], pre_normalize=True)
    want = (2 * _unit(mat[1]) + _unit(mat[2])) / 3.0
    np.testing.assert_allclose(m, want, atol=1e-12)
    m2 = KV.mean_vector(df, [1, 2], pre_normalize=False, post_normalize=True)
    np.testing.assert_allclose(m2, _unit((mat[1] + mat[2]) / 2), atol=1e-12)
    with pytest.raises(KeyError):
        KV.mean_vector(df, [999])
    assert KV.mean_vector(df, [1, 999], ignore_missing=True) is not None


def test_similarity_n_similarity_rank(kv_df):
    mat, df = kv_df
    s = KV.similarity(df, 4, 9)
    assert s == pytest.approx(float(_unit(mat[4]) @ _unit(mat[9])))
    ns = KV.n_similarity(df, [1, 2, 3], [4, 5])
    want = float(_unit(np.mean(mat[[1, 2, 3]], axis=0))
                 @ _unit(np.mean(mat[[4, 5]], axis=0)))
    assert ns == pytest.approx(want)

    dists = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ _unit(mat[0])
    order = [i for i in np.argsort(-dists) if i != 0]
    k2 = order[2]
    assert KV.rank(df, 0, k2) == 3


def test_distances(kv_df):
    mat, df = kv_df
    out = {r["vec_id"]: r["dist"]
           for r in KV.distances(df, 6).collect()}
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for i in range(50):
        assert out[i] == pytest.approx(1.0 - float(unit[i] @ _unit(mat[6])),
                                       abs=1e-9)


def test_facade(kv_df, spark):
    from gensim_spark.api import KeyedVectors

    mat, df = kv_df
    kv = KeyedVectors(df)
    ms = kv.most_similar(positive=[0], topn=3)
    assert len(ms) == 3 and all(isinstance(k, int) for k, _ in ms)
    assert kv.similar_by_key(0, topn=3) == ms
    assert kv.distance(2, 5) == pytest.approx(1.0 - kv.similarity(2, 5))
    assert kv.rank(0, ms[0][0]) == 1

    # similar_by_vector with word 0's own vector: word 0 itself ranks first
    sbv = kv.similar_by_vector(mat[0], topn=4)
    assert sbv[0][0] == 0 and sbv[0][1] == pytest.approx(1.0, abs=1e-6)
    assert [k for k, _ in sbv[1:]] == [k for k, _ in ms]


def test_most_similar_cosmul_matches_reference_kernel(kv_df):
    mat, df = kv_df
    # reference (keyedvectors.py:1011-1098): shifted cosines over unit
    # vectors, product of positives / (product of negatives + 1e-6)
    pos, neg = [2, 8], [5]
    units = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    p = np.prod([(1 + units @ _unit(mat[k])) / 2 for k in pos], axis=0)
    n = np.prod([(1 + units @ _unit(mat[k])) / 2 for k in neg], axis=0)
    score = p / (n + 1e-6)
    order = [i for i in sorted(range(50), key=lambda i: (-score[i], i))
             if i not in pos + neg][:5]

    got = KV.most_similar_cosmul(df, pos, neg, topn=5).collect()
    assert [r["vec_id"] for r in got] == order
    for r, want_i in zip(got, order):
        assert r["score"] == pytest.approx(round(float(score[want_i]), 6))
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        KV.most_similar_cosmul(df, positive=[])
    with pytest.raises(KeyError):
        KV.most_similar_cosmul(df, positive=[999])


def test_closer_than_and_most_similar_to_given(kv_df):
    mat, df = kv_df
    units = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = units @ _unit(mat[6])
    want = sorted(i for i in range(50)
                  if sims[i] > sims[13] and i not in (6, 13))
    got = sorted(r["vec_id"] for r in KV.closer_than(df, 6, 13).collect())
    assert got == want

    # reference keyedvectors.py:651-653: argmax of similarity to key1
    pool = [4, 17, 23, 31]
    pool_sims = [float(_unit(mat[6]) @ _unit(mat[k])) for k in pool]
    assert KV.most_similar_to_given(df, 6, pool) == pool[
        int(np.argmax(pool_sims))]


def test_rank_by_centrality_and_doesnt_match(kv_df):
    mat, df = kv_df
    words = [3, 9, 14, 21, 40]
    units = np.vstack([_unit(mat[w]) for w in words])
    mean = _unit(units.mean(axis=0))
    dists = units @ mean
    want = sorted(zip((float(d) for d in dists), words), reverse=True)
    got = KV.rank_by_centrality(df, words)
    assert [w for _, w in got] == [w for _, w in want]
    for (gd, _), (wd, _) in zip(got, want):
        assert gd == pytest.approx(wd)
    assert KV.doesnt_match(df, words) == want[-1][1]
    with pytest.raises(ValueError):
        KV.rank_by_centrality(df, [])


def test_relative_cosine_similarity(kv_df):
    mat, df = kv_df
    units = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = units @ _unit(mat[12])
    top = sorted((s for i, s in enumerate(sims) if i != 12), reverse=True)[:10]
    want = float(_unit(mat[12]) @ _unit(mat[30])) / sum(
        round(s, 6) for s in top)
    assert KV.relative_cosine_similarity(df, 12, 30, topn=10) == \
        pytest.approx(want, abs=1e-6)


def test_vectors_for_all_plain(kv_df, spark):
    """vectors_for_all on a plain KV (keyedvectors.py): dedup, missing
    keys dropped, same vectors, and the result is a working KeyedVectors."""
    from gensim_spark.api import KeyedVectors as KVF

    mat, df = kv_df
    kv = KVF(df)
    sub = kv.vectors_for_all([3, 7, 3, 999, 11])  # dup + missing
    rows = {r["vec_id"]: r["embedding"]
            for r in sub.df.select("vec_id", "embedding").collect()}
    assert set(rows) == {3, 7, 11}
    np.testing.assert_allclose(rows[7], mat[7])
    # restricted most_similar only sees the subset
    got = sub.most_similar(positive=[3], topn=5)
    assert {k for k, _ in got} <= {7, 11}


def test_most_similar_raw_vector_query(kv_df):
    """Raw-vector entries in positive/negative (reference
    keyedvectors.py:820-858): used directly in the mean (unit-normalized
    under pre_normalize), and never excluded from the result — they have
    no key. A vector query equal to a stored row must therefore return
    that row itself at sim≈1."""
    mat, df = kv_df
    got = KV.most_similar(df, positive=np.asarray(mat[7]), topn=3).collect()
    assert got[0]["vec_id"] == 7
    assert abs(got[0]["sim"] - 1.0) < 1e-6

    # mixing a named key and a raw vector: mean of the two unit vectors,
    # only the named key excluded — replicate with the numpy kernel
    q = _unit(_unit(mat[3]) + _unit(mat[9]))
    sims = mat @ q / np.linalg.norm(mat, axis=1)
    order = [i for i in np.argsort(-sims) if i != 3][:3]
    # `order` keeps 9 as a candidate — only the named key 3 is excluded
    got = KV.most_similar(df, positive=[3, np.asarray(mat[9])],
                          topn=3).collect()
    assert [r["vec_id"] for r in got] == order


def test_mean_vector_raw_vector_entries(kv_df):
    mat, df = kv_df
    got = KV.mean_vector(df, [2, np.asarray(mat[4])], pre_normalize=True)
    want = (_unit(mat[2]) + _unit(mat[4])) / 2.0
    np.testing.assert_allclose(got, want, rtol=1e-10)
