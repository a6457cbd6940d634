"""AnnIndexer (the reference's pluggable indexer contract,
similarities/annoy.py + nmslib.py consumed at keyedvectors.py:848-849)
over LSH / IVF / brute DataFrame indexes."""

import numpy as np
import pytest

from gensim_spark.operators import keyedvectors as KV
from gensim_spark.operators.annindexer import AnnIndexer


@pytest.fixture(scope="module")
def kv_df(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(60)],
        "vec_id long, embedding array<double>")
    return mat, df


def _brute_order(mat, v, topn):
    dists = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ (
        v / np.linalg.norm(v))
    return [i for i in sorted(range(len(mat)),
                              key=lambda i: (-dists[i], i))][:topn], dists


def test_brute_indexer_exact_and_includes_query(kv_df):
    mat, df = kv_df
    idx = AnnIndexer(df, method="brute")
    # reference contract (annoy.py docstring): most_similar("cat") with an
    # indexer returns cat itself at sim 1.0 — inputs are NOT excluded
    got = KV.most_similar(df, [7], topn=3, indexer=idx).collect()
    assert got[0]["vec_id"] == 7
    assert got[0]["sim"] == pytest.approx(1.0)
    order, dists = _brute_order(mat, KV.mean_vector(df, [7]), 3)
    assert [r["vec_id"] for r in got] == order
    for r, i in zip(got, order):
        assert r["sim"] == pytest.approx(round(float(dists[i]), 6))


def test_lsh_indexer_candidates_share_bucket(kv_df):
    mat, df = kv_df
    idx = AnnIndexer(df, method="lsh", planes=2)  # 4 buckets, dense enough
    res = idx.most_similar(mat[5], topn=5)
    # the query key itself shares its own bucket → always a candidate,
    # and at sim 1.0 it ranks first
    assert res[0][0] == 5
    assert res[0][1] == pytest.approx(1.0)
    # every candidate really is in the query's bucket
    buckets = {r["vec_id"]: r["bucket"]
               for r in idx._index.select("vec_id", "bucket").collect()}
    qb = idx._query_bucket(np.asarray(mat[5], dtype=np.float64))
    assert all(buckets[k] == qb for k, _ in res)
    # driver-side bucket replica == the Spark-side bucket of the same vector
    assert buckets[5] == qb


def test_ivf_full_probe_equals_brute(kv_df):
    mat, df = kv_df
    idx = AnnIndexer(df, method="ivf", n_cells=4, n_probe=4)
    order, dists = _brute_order(mat, mat[9], 6)
    got = idx.most_similar(mat[9], topn=6)
    assert [k for k, _ in got] == order
    for (_, s), i in zip(got, order):
        assert s == pytest.approx(round(float(dists[i]), 6))


def test_ivf_partial_probe_subsets_cells(kv_df):
    mat, df = kv_df
    idx = AnnIndexer(df, method="ivf", n_cells=6, n_probe=2)
    got = idx.most_similar(mat[3], topn=10)
    cells = {r["vec_id"]: r["cell"]
             for r in idx._index.select("vec_id", "cell").collect()}
    assert len({cells[k] for k, _ in got}) <= 2


def test_save_load_round_trip(kv_df, spark, tmp_path):
    mat, df = kv_df
    for method in ("lsh", "ivf"):
        idx = AnnIndexer(df, method=method, planes=3, n_cells=4, n_probe=2)
        want = idx.most_similar(mat[2], topn=5)
        p = str(tmp_path / f"idx_{method}")
        idx.save(p)
        got = AnnIndexer.load(spark, p).most_similar(mat[2], topn=5)
        assert got == want


def test_facade_indexer_kwarg(kv_df):
    mat, df = kv_df
    from gensim_spark.api import KeyedVectors

    kv = KeyedVectors(df)
    idx = AnnIndexer(df, method="brute")
    res = kv.most_similar(positive=[4], topn=2, indexer=idx)
    assert isinstance(res, list) and res[0][0] == 4
    assert res[0][1] == pytest.approx(1.0)


def test_ivf_indexed_vector_probes_own_cell(kv_df):
    """Probe-cell ranking uses the same left-to-right IEEE fold as the
    Spark-side cell assignment, so a query identical to an indexed vector
    always probes that vector's own cell first — even with n_probe=1 the
    vector finds itself at sim 1.0 (the near-tie parity fix LSH got in
    commit 35bc3f8, applied to IVF)."""
    mat, df = kv_df
    idx = AnnIndexer(df, method="ivf", n_cells=6, n_probe=1)
    for i in (0, 17, 42, 59):
        got = idx.most_similar(mat[i], topn=1)
        assert got[0][0] == i
        assert abs(got[0][1] - 1.0) < 1e-9


def test_indexer_result_renamed_to_key_col(kv_df, spark):
    """most_similar(key_col=...) must present the indexer's result under
    the caller's key column name."""
    mat, df = kv_df
    tok = df.selectExpr("concat('w', vec_id) as token", "embedding")
    idx = AnnIndexer(tok, method="lsh", planes=4, key_col="token")
    out = KV.most_similar(tok, "w5", topn=3, key_col="token", indexer=idx)
    assert out.columns[0] == "token"
    assert len(out.collect()) == 3
