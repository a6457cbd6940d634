"""TranslationMatrix parity vs numpy lstsq (translation_matrix.py:236-256)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import translation as TR


def make_spaces(spark, rng, n=40, d=8):
    src = rng.normal(size=(n, d))
    w_true = rng.normal(size=(d, d))
    tgt = src @ w_true + 0.01 * rng.normal(size=(n, d))
    src_df = spark.createDataFrame(
        [(i, [float(x) for x in src[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    tgt_df = spark.createDataFrame(
        [(i, [float(x) for x in tgt[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    pairs = spark.createDataFrame([(i, i) for i in range(n)],
                                  "src_id long, tgt_id long")
    return src, tgt, src_df, tgt_df, pairs


def _unit(m):
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    return np.where(nrm > 0, m / nrm, m)


def test_fit_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(0)
    src, tgt, src_df, tgt_df, pairs = make_spaces(spark, rng)

    # TranslationMatrix path: normalized spaces (Space.normalize)
    w = TR.fit_translation_matrix(pairs, src_df, tgt_df, dims=8)
    want = np.linalg.lstsq(_unit(src), _unit(tgt), rcond=-1)[0]
    np.testing.assert_allclose(w, want, atol=1e-8)

    # BackMapping path: raw vectors (translation_matrix.py:414-436)
    w2 = TR.fit_translation_matrix(pairs, src_df, tgt_df, dims=8,
                                   normalize=False)
    want2 = np.linalg.lstsq(src, tgt, rcond=-1)[0]
    np.testing.assert_allclose(w2, want2, atol=1e-8)


def test_normal_equations_partition_invariant(spark):
    rng = np.random.default_rng(3)
    src, tgt, src_df, tgt_df, pairs = make_spaces(spark, rng, n=25, d=6)
    a1 = TR.normal_equations(pairs.repartition(1), src_df, tgt_df, 6)
    a7 = TR.normal_equations(pairs.repartition(7), src_df, tgt_df, 6)
    np.testing.assert_allclose(a1[0], a7[0], atol=1e-12)
    np.testing.assert_allclose(a1[1], a7[1], atol=1e-12)
    np.testing.assert_allclose(a1[0], src.T @ src, atol=1e-10)
    np.testing.assert_allclose(a1[1], src.T @ tgt, atol=1e-10)


def test_translate_cosine_retrieval(spark):
    rng = np.random.default_rng(7)
    src, tgt, src_df, tgt_df, pairs = make_spaces(spark, rng, n=30, d=6)
    w = TR.fit_translation_matrix(pairs, src_df, tgt_df, dims=6)
    out = TR.translate(src_df.filter(F.col("vec_id") < 4), tgt_df, w,
                       topn=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["src_id"], []).append((r["rank"], r["tgt_id"],
                                                r["sim"]))
    mapped = _unit(src[:4]) @ w
    tn = _unit(tgt)
    for s in range(4):
        sims = tn @ mapped[s]
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))[:3]
        ranked = sorted(got[s])
        assert [t for _, t, _ in ranked] == order
        for (rk, t, sim), want_t in zip(ranked, order):
            assert sim == pytest.approx(round(float(sims[want_t]), 6))
    # with near-exact linear map, the paired target should rank first
    top1 = [t for s in range(4) for rk, t, _ in sorted(got[s]) if rk == 1]
    assert top1 == [0, 1, 2, 3]


def test_infer_vector():
    rng = np.random.default_rng(9)
    w = rng.normal(size=(5, 5))
    v = rng.normal(size=5)
    np.testing.assert_allclose(TR.infer_vector(v, w), v @ w)


def test_apply_transmat_shape(spark):
    rng = np.random.default_rng(11)
    _, _, src_df, _, _ = make_spaces(spark, rng, n=10, d=4)
    w = rng.normal(size=(4, 4))
    out = TR.apply_transmat(src_df, w).collect()
    assert len(out) == 10
    src_rows = {r["vec_id"]: np.array(r["embedding"])
                for r in src_df.collect()}
    for r in out:
        np.testing.assert_allclose(np.array(r["embedding"]),
                                   src_rows[r["vec_id"]] @ w, atol=1e-12)


def test_translation_facade(spark):
    from gensim_spark.api import TranslationMatrix

    rng = np.random.default_rng(4)
    src, tgt, src_df, tgt_df, pairs = make_spaces(spark, rng)
    tm = TranslationMatrix(src_df, tgt_df, word_pairs=pairs)
    assert tm.translation_matrix.shape == (8, 8)
    want = np.linalg.lstsq(_unit(src), _unit(tgt), rcond=-1)[0]
    np.testing.assert_allclose(tm.translation_matrix, want, atol=1e-8)
    # self-translation: each source's top-1 should overwhelmingly be its
    # own paired target (the spaces are a noisy linear map of each other)
    top1 = tm.translate(topn=1).filter("rank = 1")
    hits = top1.filter(F.col("src_id") == F.col("tgt_id")).count()
    assert hits >= 36   # ≥90% of 40
    mapped = tm.apply_transmat(src_df)
    assert mapped.count() == 40
