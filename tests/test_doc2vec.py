"""Doc2Vec PV-DM / PV-DBOW(+words): distributed shard-sync training with
distributed doc-vector state vs a sequential replica, partitioning
invariance, planted-topic separation, frozen-matrix inference."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import doc2vec as D2V


def replica_fit(doc_list, vocab_size, counts, num_shards=4, dm=1,
                dm_mean=1, dbow_words=0, hs=0, dm_concat=0, **kw):
    """Driver-only replica of doc2vec_fit: same shard split, same
    per-(epoch, doc) seeds, same count-weighted word fold, doc vectors
    carried between epochs exactly like the distributed DataFrame state."""
    vector_size = kw.get("vector_size", 12)
    window = kw.get("window", 3)
    negative = kw.get("negative", 3)
    alpha = kw.get("alpha", 0.025)
    min_alpha = kw.get("min_alpha", 0.0001)
    epochs = kw.get("epochs", 2)
    sample = kw.get("sample", 1e-3)
    seed = kw.get("seed", 1)

    counts = np.asarray(counts)
    dm_concat = 1 if (dm and dm_concat) else 0
    null_index = None
    out_width = vector_size
    if dm_concat:
        null_index = vocab_size
        vocab_size += 1
        counts = np.append(counts, 1)
        out_width = (1 + 2 * window) * vector_size
    codes = points = syn1hs = None
    if hs:
        from gensim_spark.operators.word2vec import build_huffman_tree
        codes, points = build_huffman_tree(counts)
        syn1hs = np.zeros((vocab_size, out_width))
    wv = D2V.Word2VecModel(
        vocab_size, vector_size,
        D2V.init_syn0(vocab_size, vector_size, seed),
        np.zeros((vocab_size, out_width)),
        D2V.make_cum_table(counts),
        D2V.make_sample_ints(counts, sample),
        window, negative, seed, sg=0, cbow_mean=dm_mean,
        hs=hs, syn1=syn1hs, codes=codes, points=points)
    dv = {d: D2V.init_doc_vector(d, vector_size, seed)
          for d, _ in doc_list}
    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        rows = []
        new_dv = {}
        for s in range(num_shards):
            syn0 = wv.syn0.copy()
            syn1 = wv.syn1neg.copy()
            s1h = wv.syn1.copy() if hs else None
            cnts = np.zeros(vocab_size, dtype=np.int64)
            cnts_h = np.zeros(vocab_size, dtype=np.int64) if hs else None
            hs_kw = dict(hs=hs, syn1hs=s1h, codes=codes, points=points,
                         counts_hs=cnts_h) if hs else {}
            for doc_id, ids in sorted(d for d in doc_list
                                      if d[0] % num_shards == s):
                vec = dv[doc_id].copy()
                ds = D2V._mix(seed, epoch, doc_id)
                if dm and dm_concat:
                    D2V.train_doc_dmc(np.asarray(ids, dtype=np.int64), vec,
                                      syn0, syn1, wv.cum_table,
                                      wv.sample_ints, window, negative, a,
                                      ds, cnts, null_index, **hs_kw)
                elif dm:
                    D2V.train_doc_dm(np.asarray(ids, dtype=np.int64), vec,
                                     syn0, syn1, wv.cum_table,
                                     wv.sample_ints, window, negative, a,
                                     ds, cnts, cbow_mean=dm_mean, **hs_kw)
                else:
                    D2V.train_doc_dbow(np.asarray(ids, dtype=np.int64), vec,
                                       syn0, syn1, wv.cum_table,
                                       wv.sample_ints, window, negative, a,
                                       ds, cnts,
                                       train_words=bool(dbow_words),
                                       **hs_kw)
                new_dv[doc_id] = vec
            for w in np.nonzero(cnts)[0]:
                rows.append({"m": 0, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn0[w] - wv.syn0[w])})
                rows.append({"m": 1, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn1[w] - wv.syn1neg[w])})
            if hs:
                for w in np.nonzero(cnts_h)[0]:
                    rows.append({"m": 2, "w": int(w), "cnt": int(cnts_h[w]),
                                 "delta": list(s1h[w] - wv.syn1[w])})
        D2V.fold_epoch(wv, rows)
        dv = new_dv
    return wv, dv


def planted_docs(rng, n_docs=80, vocab=10, doc_len=15):
    docs = []
    for d in range(n_docs):
        comm = d % 2
        words = [int(vocab // 2 * comm + rng.integers(vocab // 2))
                 for _ in range(doc_len)]
        docs.append((d, words))
    counts = np.zeros(vocab, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    return docs, counts


def _fit_both(spark, dm, dbow_words, seed=5, hs=0, negative=3):
    rng = np.random.default_rng(seed)
    docs, counts = planted_docs(rng)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    kw = dict(vector_size=12, window=3, negative=negative, epochs=2, seed=1)
    want_wv, want_dv = replica_fit(docs, 10, counts, num_shards=4, dm=dm,
                                   dbow_words=dbow_words, hs=hs, **kw)
    got = D2V.doc2vec_fit(df.repartition(7), 10, counts, num_shards=4,
                          dm=dm, dbow_words=dbow_words, hs=hs, **kw)
    return want_wv, want_dv, got


@pytest.mark.parametrize("dm,dbow_words", [(1, 0), (0, 1), (0, 0)])
def test_distributed_matches_replica(spark, dm, dbow_words):
    want_wv, want_dv, got = _fit_both(spark, dm, dbow_words)
    np.testing.assert_allclose(got.wv.syn0, want_wv.syn0, atol=0)
    np.testing.assert_allclose(got.wv.syn1neg, want_wv.syn1neg, atol=0)
    got_dv = {r["doc_id"]: np.asarray(r["dvec"])
              for r in got.dv.collect()}
    assert set(got_dv) == set(want_dv)
    for d, v in want_dv.items():
        np.testing.assert_allclose(got_dv[d], v, atol=0)


@pytest.mark.parametrize("dm,dbow_words,negative",
                         [(1, 0, 3), (0, 1, 3), (1, 0, 0)])
def test_hs_distributed_matches_replica(spark, dm, dbow_words, negative):
    """hs=1 through both kernels — composed with negative sampling (the
    reference runs both stages when both are set) and hs-only
    (negative=0 skips the whole neg stage, positive sample included)."""
    want_wv, want_dv, got = _fit_both(spark, dm, dbow_words, hs=1,
                                      negative=negative)
    np.testing.assert_allclose(got.wv.syn0, want_wv.syn0, atol=0)
    np.testing.assert_allclose(got.wv.syn1neg, want_wv.syn1neg, atol=0)
    np.testing.assert_allclose(got.wv.syn1, want_wv.syn1, atol=0)
    assert np.abs(got.wv.syn1).sum() > 0  # the hs matrix actually trained
    if negative == 0:
        assert np.abs(got.wv.syn1neg).sum() == 0  # neg stage fully skipped
    got_dv = {r["doc_id"]: np.asarray(r["dvec"])
              for r in got.dv.collect()}
    for d, v in want_dv.items():
        np.testing.assert_allclose(got_dv[d], v, atol=0)


@pytest.mark.parametrize("hs", [0, 1])
def test_dm_concat_distributed_matches_replica(spark, hs):
    """dm_concat=1 (train_document_dm_concat): concatenated layer1 with
    null-word padding, layer1-wide output matrices, full windows."""
    rng = np.random.default_rng(5)
    docs, counts = planted_docs(rng)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    kw = dict(vector_size=6, window=2, negative=3, epochs=2, seed=1)
    want_wv, want_dv = replica_fit(docs, 10, counts, num_shards=4, dm=1,
                                   dm_concat=1, hs=hs, **kw)
    got = D2V.doc2vec_fit(df.repartition(7), 10, counts, num_shards=4,
                          dm=1, dm_concat=1, hs=hs, **kw)
    assert got.null_index == 10
    assert got.wv.syn0.shape == (11, 6)          # null pad row appended
    assert got.wv.syn1neg.shape == (11, (1 + 2 * 2) * 6)  # layer1-wide
    np.testing.assert_allclose(got.wv.syn0, want_wv.syn0, atol=0)
    np.testing.assert_allclose(got.wv.syn1neg, want_wv.syn1neg, atol=0)
    if hs:
        np.testing.assert_allclose(got.wv.syn1, want_wv.syn1, atol=0)
        assert np.abs(got.wv.syn1).sum() > 0
    # the null word's vector trained (boundary windows pad with it)
    assert np.abs(got.wv.syn0[10] - want_wv.syn0[10]).sum() == 0
    got_dv = {r["doc_id"]: np.asarray(r["dvec"]) for r in got.dv.collect()}
    for d, v in want_dv.items():
        np.testing.assert_allclose(got_dv[d], v, atol=0)
    # inference works against the concat model and leaves it frozen
    new = spark.createDataFrame([(900, [1, 2, 3, 4])],
                                "doc_id long, ids array<long>")
    inf = D2V.infer_vectors(new, got, epochs=2).collect()
    assert len(inf) == 1 and len(inf[0]["embedding"]) == 6


def test_dmc_kernel_null_padding():
    """A position at the document edge pads out-of-range slots with the
    null row — the null vector must receive word-side updates."""
    rng = np.random.RandomState(3)
    V, size, window = 5, 4, 2
    null = V
    syn0 = rng.normal(size=(V + 1, size))
    syn1 = rng.normal(size=(V + 1, (1 + 2 * window) * size))
    before_null = syn0[null].copy()
    counts = np.zeros(V + 1, dtype=np.int64)
    cum = D2V.make_cum_table(np.ones(V + 1))
    samp = D2V.make_sample_ints(np.ones(V + 1), 0)
    dvec = np.zeros(size)
    D2V.train_doc_dmc(np.array([0, 1, 2]), dvec, syn0, syn1, cum, samp,
                      window, 2, 0.05, 7, counts, null)
    assert counts[null] > 0                      # null slots were updated
    assert np.abs(syn0[null] - before_null).sum() > 0
    assert np.abs(dvec).sum() > 0


def test_hs_infer_deterministic(spark):
    _, _, got = _fit_both(spark, 1, 0, hs=1)
    docs = spark.createDataFrame([(900, [1, 2, 3, 4, 1, 2]),
                                  (901, [5, 6, 7, 8, 5, 6])],
                                 "doc_id long, ids array<long>")
    syn1_before = got.wv.syn1.copy()
    a = {r["doc_id"]: np.asarray(r["embedding"])
         for r in D2V.infer_vectors(docs, got, epochs=3).collect()}
    b = {r["doc_id"]: np.asarray(r["embedding"])
         for r in D2V.infer_vectors(docs, got, epochs=3).collect()}
    for d in a:
        np.testing.assert_allclose(a[d], b[d], atol=0)
        assert np.abs(a[d]).sum() > 0
    # frozen matrices: the hs matrix is untouched by inference
    np.testing.assert_allclose(got.wv.syn1, syn1_before, atol=0)


def test_dm_separates_topics(spark):
    rng = np.random.default_rng(7)
    docs, counts = planted_docs(rng, n_docs=100, doc_len=20)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m = D2V.doc2vec_fit(df, 10, counts, vector_size=16, window=4,
                        negative=5, epochs=20, sample=0, num_shards=8,
                        seed=2, dm=1)
    dv = {r["doc_id"]: np.asarray(r["dvec"]) for r in m.dv.collect()}
    unit = {d: v / np.linalg.norm(v) for d, v in dv.items()}
    within = np.mean([unit[a] @ unit[b] for a in range(0, 20, 2)
                      for b in range(0, 20, 2) if a != b])
    across = np.mean([unit[a] @ unit[b] for a in range(0, 20, 2)
                      for b in range(1, 20, 2)])
    assert within > across + 0.3  # measured 0.98 vs 0.45 at 20 epochs


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(11)
    docs, counts = planted_docs(rng, n_docs=40)
    kw = dict(vector_size=8, window=3, negative=3, epochs=2, seed=3,
              num_shards=4, dm=1)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m1 = D2V.doc2vec_fit(df, 10, counts, **kw)
    m2 = D2V.doc2vec_fit(df.repartition(13), 10, counts, **kw)
    np.testing.assert_allclose(m1.wv.syn0, m2.wv.syn0, atol=0)
    d1 = {r["doc_id"]: r["dvec"] for r in m1.dv.collect()}
    d2 = {r["doc_id"]: r["dvec"] for r in m2.dv.collect()}
    for d in d1:
        np.testing.assert_allclose(d1[d], d2[d], atol=0)


def test_infer_vectors_frozen_and_deterministic(spark):
    rng = np.random.default_rng(13)
    docs, counts = planted_docs(rng, n_docs=60, doc_len=20)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m = D2V.doc2vec_fit(df, 10, counts, vector_size=16, window=4,
                        negative=5, epochs=6, sample=0, num_shards=8,
                        seed=2, dm=1)
    syn0_before = m.wv.syn0.copy()
    inf1 = {r["doc_id"]: np.asarray(r["embedding"])
            for r in D2V.infer_vectors(df, m, epochs=5).collect()}
    inf2 = {r["doc_id"]: np.asarray(r["embedding"])
            for r in D2V.infer_vectors(df.repartition(9), m,
                                       epochs=5).collect()}
    np.testing.assert_array_equal(m.wv.syn0, syn0_before)  # frozen
    for d in inf1:
        np.testing.assert_allclose(inf1[d], inf2[d], atol=0)
    # inferred vectors land on the right side of the topic split
    unit = {d: v / np.linalg.norm(v) for d, v in inf1.items()}
    within = np.mean([unit[a] @ unit[b] for a in range(0, 16, 2)
                      for b in range(0, 16, 2) if a != b])
    across = np.mean([unit[a] @ unit[b] for a in range(0, 16, 2)
                      for b in range(1, 16, 2)])
    assert within > across


def test_d2v_shrink_windows_false(spark):
    """shrink_windows=False (dm=1): full context windows; result differs
    from the shrunk run and is deterministic across partitionings."""
    import numpy as np

    rng = np.random.default_rng(13)
    docs = [(d, [int(rng.integers(10)) for _ in range(12)])
            for d in range(16)]
    counts = np.zeros(10, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame(docs, "doc_id long, ids array<long>")
    kw = dict(vector_size=6, window=2, negative=2, epochs=1, sample=0,
              seed=3, num_shards=2, dm=1)
    a = D2V.doc2vec_fit(df, 10, counts, shrink_windows=False, **kw)
    b = D2V.doc2vec_fit(df.repartition(3), 10, counts,
                        shrink_windows=False, **kw)
    c = D2V.doc2vec_fit(df, 10, counts, **kw)
    np.testing.assert_allclose(a.wv.syn0, b.wv.syn0, atol=1e-12)
    assert not np.allclose(a.wv.syn0, c.wv.syn0)
