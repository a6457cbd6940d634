"""Similarity search: brute-force exactness vs numpy, LSH and IVF recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def brute_topk(vecs, qids, k):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        sims = vecs @ vecs[q] / (norms * norms[q])
        order = sorted(range(len(vecs)), key=lambda i: (-sims[i], i))[:k]
        out[q] = [(i, float(sims[i])) for i in order]
    return out


def test_cosine_topk_exact(spark, emb):
    from gensim_spark.operators import simsearch as S

    df, vecs = emb
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in S.cosine_topk(df, q, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cosine"])
        )
    want = brute_topk(vecs, [0, 1, 2], 5)
    for qid in want:
        rows = sorted(got[qid])
        assert [v for _, v, _ in rows] == [i for i, _ in want[qid]]
        for (_, _, gc), (_, wc) in zip(rows, want[qid]):
            assert gc == pytest.approx(wc, rel=1e-5)  # float32 inputs


def test_ivf_topk_recall(spark, emb):
    from gensim_spark.operators import simsearch as S

    df, vecs = emb
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in S.ivf_topk(df, q, k=10, n_cells=8, n_probe=3).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    want = brute_topk(vecs, range(5), 10)
    # self must always be found (its own cell is the nearest probe)
    recalls = []
    for qid in want:
        assert qid in got[qid]
        truth = {i for i, _ in want[qid]}
        recalls.append(len(got[qid] & truth) / len(truth))
    assert sum(recalls) / len(recalls) >= 0.5  # random data, 3/8 cells probed


def test_ivf_topk_det_matches_numpy_model(spark, emb):
    """Hash-seeded IVF replicated in numpy end-to-end: same seeds, same
    cell assignment (argmax cosine, ties → smallest cell), same probes,
    same final top-k — the cross-engine determinism the oracle relies on."""
    from gensim_spark.functions.hashing import hash60_py
    from gensim_spark.operators import simsearch as S

    df, vecs = emb
    n_cells, n_probe, k = 8, 3, 10
    # numpy model of the quantizer
    order = sorted(range(len(vecs)), key=lambda i: (hash60_py(str(i)), i))
    seed_ids = order[:n_cells]
    sv = vecs[seed_ids].astype(np.float64)
    vn = vecs.astype(np.float64)
    cos_mat = (vn @ sv.T) / (
        np.linalg.norm(vn, axis=1, keepdims=True)
        * np.linalg.norm(sv, axis=1)
    )
    assign = np.argmax(cos_mat, axis=1)  # argmax takes first (smallest cell)
    got_assign = {
        r["vec_id"]: r["cell"]
        for r in S.ivf_assign_det(
            df, S.ivf_seed_rows(df, n_cells)).collect()
    }
    assert got_assign == {i: int(assign[i]) for i in range(len(vecs))}
    # probes + final top-k
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in S.ivf_topk_det(df, q, k=k, n_cells=n_cells,
                            n_probe=n_probe).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cosine"])
        )
    norms = np.linalg.norm(vn, axis=1)
    for qid in range(3):
        probe_cells = sorted(
            range(n_cells), key=lambda c: (-cos_mat[qid, c], c))[:n_probe]
        cand = [i for i in range(len(vecs)) if assign[i] in probe_cells]
        sims = vn[cand] @ vn[qid] / (norms[cand] * norms[qid])
        want = sorted(zip(cand, sims), key=lambda t: (-t[1], t[0]))[:k]
        rows = sorted(got[qid])
        assert [v for _, v, _ in rows] == [i for i, _ in want]
        for (_, _, gc), (_, wc) in zip(rows, want):
            assert gc == pytest.approx(float(wc), rel=1e-6)


def test_embedding_near_dups_lsh_matches_bucketed_brute(spark, emb):
    """LSH near-dups == brute-force pairs restricted to equal buckets, and
    the plan contains NO cartesian product (the 100 TB guarantee)."""
    from gensim_spark.operators import dedup as D
    from gensim_spark.operators import simsearch as S

    df, vecs = emb
    threshold = 0.3
    out = D.embedding_near_dups_lsh(df, threshold=threshold, planes=4,
                                    dims=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out.collect()}
    buckets = {r["vec_id"]: r["bucket"]
               for r in S.lsh_buckets(df, planes=4, dims=16).collect()}
    norms = np.linalg.norm(vecs, axis=1)
    want = {}
    n = len(vecs)
    for a in range(n):
        for b in range(a + 1, n):
            if buckets[a] != buckets[b]:
                continue
            c = float(vecs[a] @ vecs[b] / (norms[a] * norms[b]))
            if c >= threshold:
                want[(a, b)] = c
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-5)


def test_lsh_topk_subset_of_bucket(spark, emb):
    from gensim_spark.operators import simsearch as S

    df, vecs = emb
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = S.lsh_topk(df, q, k=5, planes=4, dims=16).collect()
    buckets = {r["vec_id"]: r["bucket"]
               for r in S.lsh_buckets(df, planes=4, dims=16).collect()}
    for r in rows:
        assert buckets[r["vec_id"]] == buckets[r["query_id"]]
        # cosine is the true cosine
        a, b = vecs[r["query_id"]], vecs[r["vec_id"]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cosine"] == pytest.approx(want, rel=1e-5)
