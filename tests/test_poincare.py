"""Poincaré embeddings: exact-gradient checks vs finite differences,
ball-clip quirk, distributed training sanity + determinism, relational knn."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import poincare as P


def ref_loss(vu, vv, reg):
    """Direct loss: -log softmax of -d over (positive, negatives) + l2 reg
    on the positive v (PoincareBatch.compute_loss + the reg term folded
    into the gradients in the reference)."""
    def dist(a, b):
        g = 1 + 2 * np.sum((a - b) ** 2) / ((1 - a @ a) * (1 - b @ b))
        return np.arccosh(g)

    total = 0.0
    b = vu.shape[0]
    for col in range(b):
        ds = np.array([dist(vu[col], vv[s, :, col])
                       for s in range(vv.shape[0])])
        e = np.exp(-ds)
        total += -np.log(e[0] / e.sum())
        total += reg * (vv[0, :, col] @ vv[0, :, col])
    return total


def test_batch_gradients_match_finite_differences():
    rng = np.random.default_rng(0)
    b, d, neg = 3, 4, 2
    vu = rng.uniform(-0.3, 0.3, size=(b, d))
    vv = rng.uniform(-0.3, 0.3, size=(1 + neg, d, b))
    reg = 1.0
    gu, gv, alpha, beta, loss = P.batch_gradients(vu, vv, reg)
    assert loss == pytest.approx(ref_loss(vu, vv, 0.0), rel=1e-10)

    eps = 1e-7
    for col in range(b):
        for dim in range(d):
            up = vu.copy()
            up[col, dim] += eps
            dn = vu.copy()
            dn[col, dim] -= eps
            want = (ref_loss(up, vv, reg) - ref_loss(dn, vv, reg)) / (2 * eps)
            assert gu[dim, col] == pytest.approx(want, rel=1e-4, abs=1e-7)
    for s in range(1 + neg):
        for col in range(b):
            for dim in range(d):
                up = vv.copy()
                up[s, dim, col] += eps
                dn = vv.copy()
                dn[s, dim, col] -= eps
                want = (ref_loss(vu, up, reg)
                        - ref_loss(vu, dn, reg)) / (2 * eps)
                assert gv[s, dim, col] == pytest.approx(want, rel=1e-4,
                                                        abs=1e-7)


def test_clip_vectors_quirk():
    eps = 1e-5
    v = np.array([[0.5, 0.5], [3.0, 4.0]])
    out = P.clip_vectors(v.copy(), eps)
    np.testing.assert_array_equal(out[0], [0.5, 0.5])  # inside: untouched
    # outside: scaled to threshold then shifted by -sign*eps per dim
    want = np.array([3.0, 4.0]) / 5.0 * (1 - eps) - eps
    np.testing.assert_allclose(out[1], want, atol=1e-12)
    assert np.linalg.norm(out[1]) < 1


def _tree_relations():
    # two separate star graphs: 0-{1,2,3,4}, 5-{6,7,8,9}
    rel = [(0, c) for c in (1, 2, 3, 4)] + [(5, c) for c in (6, 7, 8, 9)]
    return rel


def test_poincare_fit_separates_components(spark):
    rel = _tree_relations()
    df = spark.createDataFrame(rel, "u long, v long")
    m = P.poincare_fit(df, num_nodes=10, size=8, negative=3, burn_in=2,
                       epochs=20, num_shards=4, seed=1)
    assert (np.linalg.norm(m.vectors, axis=1) < 1).all()

    def dist(a, b):
        g = 1 + 2 * np.sum((a - b) ** 2) / ((1 - a @ a) * (1 - b @ b))
        return np.arccosh(g)

    connected = np.mean([dist(m.vectors[u], m.vectors[v]) for u, v in rel])
    cross = np.mean([dist(m.vectors[u], m.vectors[v])
                     for u in (1, 2, 3, 4) for v in (6, 7, 8, 9)])
    assert connected < cross

    # determinism: identical result under different Spark partitioning
    m2 = P.poincare_fit(df.repartition(7), num_nodes=10, size=8, negative=3,
                        burn_in=2, epochs=20, num_shards=4, seed=1)
    np.testing.assert_allclose(m.vectors, m2.vectors, atol=0)


def test_negative_sampling_guard(spark):
    # node 0 connected to every other node: sampling 3 negatives from an
    # empty candidate pool must raise, not hang (poincare.py:286-292)
    rel = [(0, c) for c in range(1, 4)]
    df = spark.createDataFrame(rel, "u long, v long")
    with pytest.raises(Exception) as exc:
        P.poincare_fit(df, num_nodes=4, size=4, negative=3, burn_in=0,
                       epochs=1, num_shards=1, seed=1)
    assert "Cannot sample" in str(exc.value)


def test_poincare_knn_matches_numpy(spark):
    rng = np.random.default_rng(5)
    vecs = rng.uniform(-0.4, 0.4, size=(20, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "node_id long, embedding array<double>")
    out = P.poincare_knn(df, [0, 3], k=4).collect()

    def dist(a, b):
        g = 1 + 2 * np.sum((a - b) ** 2) / ((1 - a @ a) * (1 - b @ b))
        return np.arccosh(g)

    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["other_id"], r["dist"]))
    for q in (0, 3):
        ds = [(dist(vecs[q], vecs[i]), i) for i in range(20) if i != q]
        want = sorted(ds)[:4]
        ranked = sorted(got[q])
        assert [i for _, i in want] == [i for _, i, _ in ranked]
        for (wd, _), (_, _, gd) in zip(want, ranked):
            assert gd == pytest.approx(round(wd, 6), abs=1e-6)


def test_poincare_fit_id_gap_no_phantom_negatives(spark):
    # ADVICE r4: id gaps in [0, num_nodes) must not become phantom nodes.
    # Gap ids (5, 6, 7 below) carry zero weight in the negative-sampling
    # cumsum, are never drawn, and their vectors stay exactly at init.
    rel = [(0, c) for c in (1, 2, 3, 4)] + [(8, c) for c in (9, 10, 11, 12)]
    df = spark.createDataFrame(rel, "u long, v long")
    m = P.poincare_fit(df, num_nodes=13, size=6, negative=3, burn_in=1,
                       epochs=5, num_shards=4, seed=3)
    assert np.isfinite(m.vectors).all()
    for gap in (5, 6, 7):
        rs = np.random.RandomState(P._mix(3, gap, 55) & 0xFFFFFFFF)
        np.testing.assert_array_equal(m.vectors[gap],
                                      rs.uniform(-0.001, 0.001, 6))
