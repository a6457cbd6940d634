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
