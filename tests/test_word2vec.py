"""Word2Vec SGNS: distributed shard-sync training vs a sequential replica,
kernel golden values, and semantic sanity on a planted-community corpus."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import word2vec as W2V


def replica_fit(doc_list, vocab_size, counts, num_shards=4, **kw):
    """Driver-only replica of word2vec_fit: same shard split (doc_id %
    num_shards), same per-(epoch, doc) seeds, same count-weighted fold."""
    vector_size = kw.get("vector_size", 16)
    window = kw.get("window", 3)
    negative = kw.get("negative", 3)
    alpha = kw.get("alpha", 0.025)
    min_alpha = kw.get("min_alpha", 0.0001)
    epochs = kw.get("epochs", 2)
    sample = kw.get("sample", 1e-3)
    seed = kw.get("seed", 1)

    model = W2V.Word2VecModel(
        vocab_size, vector_size,
        W2V.init_syn0(vocab_size, vector_size, seed),
        np.zeros((vocab_size, vector_size)),
        W2V.make_cum_table(np.asarray(counts)),
        W2V.make_sample_ints(np.asarray(counts), sample),
        window, negative, seed)
    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        rows = []
        for s in range(num_shards):
            syn0 = model.syn0.copy()
            syn1 = model.syn1neg.copy()
            cnts = np.zeros(vocab_size, dtype=np.int64)
            for doc_id, ids in sorted(d for d in doc_list
                                      if d[0] % num_shards == s):
                W2V.train_doc_sg(np.asarray(ids, dtype=np.int64), syn0, syn1,
                                 model.cum_table, model.sample_ints,
                                 window, negative, a,
                                 W2V._mix(seed, epoch, doc_id), cnts)
            for w in np.nonzero(cnts)[0]:
                rows.append({"m": 0, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn0[w] - model.syn0[w])})
                rows.append({"m": 1, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn1[w] - model.syn1neg[w])})
        W2V.fold_epoch(model, rows)
    return model


def rand_docs(rng, n_docs=40, vocab=20, max_len=30):
    return [(d, [int(rng.integers(vocab))
                 for _ in range(int(rng.integers(5, max_len)))])
            for d in range(n_docs)]


def test_cum_table_and_sample_ints_golden():
    counts = np.array([10, 5, 1])
    cum = W2V.make_cum_table(counts, ns_exponent=0.75, domain=1000)
    pw = counts ** 0.75
    want = np.round(np.cumsum(pw) / pw.sum() * 1000)
    np.testing.assert_array_equal(cum.astype(float), want)
    assert cum[-1] == 1000

    si = W2V.make_sample_ints(np.array([10, 1]), sample=0.2)
    t = 0.2 * 11
    p0 = (np.sqrt(10 / t) + 1) * (t / 10)   # < 1: downsampled
    p1 = (np.sqrt(1 / t) + 1) * (t / 1)     # > 1: capped
    assert p0 < 1 < p1
    assert si[0] == int(p0 * 2 ** 32)
    assert si[1] == 2 ** 32  # capped at keep-probability 1.0


def test_sigmoid_table_golden():
    # mid-table value equals true sigmoid to table resolution
    assert W2V._sigmoid_table(0.0) == pytest.approx(0.5, abs=1e-2)
    assert W2V._sigmoid_table(5.9) > 0.99
    assert W2V._sigmoid_table(-5.9) < 0.01


def test_distributed_matches_replica(spark):
    rng = np.random.default_rng(17)
    docs = rand_docs(rng)
    counts = np.zeros(20, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame(
        [(d, ids) for d, ids in docs],
        "doc_id long, ids array<long>").repartition(6)

    kw = dict(vector_size=12, window=3, negative=3, epochs=2, seed=5)
    want = replica_fit(docs, 20, counts, num_shards=4, **kw)
    got = W2V.word2vec_fit(df, 20, counts, num_shards=4, **kw)
    np.testing.assert_allclose(got.syn0, want.syn0, atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, want.syn1neg, atol=1e-10)

    # invariant under Spark partitioning (shards are logical)
    got2 = W2V.word2vec_fit(df.repartition(2), 20, counts,
                            num_shards=4, **kw)
    np.testing.assert_allclose(got2.syn0, got.syn0, atol=0)


def test_semantic_communities(spark):
    # two word communities that never co-occur: within-community cosine
    # must exceed cross-community cosine after training
    rng = np.random.default_rng(3)
    docs = []
    for d in range(120):
        comm = d % 2
        words = [int(5 * comm + rng.integers(5)) for _ in range(20)]
        docs.append((d, words))
    counts = np.zeros(10, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m = W2V.word2vec_fit(df, 10, counts, vector_size=16, window=4,
                         negative=5, epochs=8, sample=0, num_shards=8,
                         seed=2)
    unit = m.syn0 / np.linalg.norm(m.syn0, axis=1, keepdims=True)
    sims = unit @ unit.T
    within = np.mean([sims[i, j] for i in range(5) for j in range(5)
                      if i != j])
    across = np.mean([sims[i, j] for i in range(5) for j in range(5, 10)])
    assert within > across + 0.2


def test_cbow_matches_replica_and_separates(spark):
    rng = np.random.default_rng(23)
    docs = []
    for d in range(100):
        comm = d % 2
        docs.append((d, [int(5 * comm + rng.integers(5))
                         for _ in range(18)]))
    counts = np.zeros(10, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    kw = dict(vector_size=12, window=3, negative=3, epochs=3, sample=0,
              seed=4, sg=0)

    got = W2V.word2vec_fit(df, 10, counts, num_shards=4, **kw)

    # sequential replica with the CBOW kernel, same shards/seeds/fold
    model = W2V.Word2VecModel(
        10, 12, W2V.init_syn0(10, 12, 4), np.zeros((10, 12)),
        W2V.make_cum_table(counts), W2V.make_sample_ints(counts, 0),
        3, 3, 4, sg=0)
    for epoch in range(3):
        a = 0.025 - (0.025 - 0.0001) * epoch / 2
        rows = []
        for s in range(4):
            syn0 = model.syn0.copy()
            syn1 = model.syn1neg.copy()
            cnts = np.zeros(10, dtype=np.int64)
            for doc_id, ids in sorted(d for d in docs if d[0] % 4 == s):
                W2V.train_doc_cbow(np.asarray(ids), syn0, syn1,
                                   model.cum_table, model.sample_ints,
                                   3, 3, a, W2V._mix(4, epoch, doc_id),
                                   cnts)
            for w in np.nonzero(cnts)[0]:
                rows.append({"m": 0, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn0[w] - model.syn0[w])})
                rows.append({"m": 1, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn1[w] - model.syn1neg[w])})
        W2V.fold_epoch(model, rows)
    np.testing.assert_allclose(got.syn0, model.syn0, atol=1e-10)

    unit = got.syn0 / np.linalg.norm(got.syn0, axis=1, keepdims=True)
    sims = unit @ unit.T
    within = np.mean([sims[i, j] for i in range(5) for j in range(5)
                      if i != j])
    across = np.mean([sims[i, j] for i in range(5) for j in range(5, 10)])
    assert within > across


def test_corpus_ids_drops_unknown(spark):
    from gensim_spark.operators import vocab as V

    tok = spark.createDataFrame(
        [(0, ["aa", "bb", "zz", "aa"]), (1, ["bb", "cc"])],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(spark.createDataFrame(
        [(0, ["aa", "bb"]), (1, ["bb", "cc"])],
        "doc_id long, tokens array<string>"))
    out = {r["doc_id"]: r["ids"]
           for r in W2V.corpus_ids(tok, vocab).collect()}
    id_of = {r["token"]: r["term_id"] for r in vocab.collect()}
    assert out[0] == [id_of["aa"], id_of["bb"], id_of["aa"]]  # zz dropped
    assert out[1] == [id_of["bb"], id_of["cc"]]


def test_dbow_doc_vectors(spark):
    rng = np.random.default_rng(9)
    docs = []
    for d in range(60):
        comm = d % 2
        docs.append((d, [int(5 * comm + rng.integers(5))
                         for _ in range(15)]))
    counts = np.zeros(10, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m = W2V.word2vec_fit(df, 10, counts, vector_size=16, window=4,
                         negative=5, epochs=6, sample=0, num_shards=8,
                         seed=2)
    dv = {r["doc_id"]: np.array(r["embedding"])
          for r in W2V.doc_vectors_dbow(df, m, epochs=8).collect()}
    assert len(dv) == 60
    unit = {d: v / np.linalg.norm(v) for d, v in dv.items()}
    within = np.mean([unit[0] @ unit[2], unit[1] @ unit[3],
                      unit[4] @ unit[6]])
    across = np.mean([unit[0] @ unit[1], unit[2] @ unit[3],
                      unit[4] @ unit[5]])
    assert within > across

    # deterministic under re-evaluation / partitioning
    dv2 = {r["doc_id"]: np.array(r["embedding"])
           for r in W2V.doc_vectors_dbow(df.repartition(5), m,
                                         epochs=8).collect()}
    np.testing.assert_allclose(dv[7], dv2[7], atol=0)


def test_facades(spark):
    from gensim_spark.api import Dictionary, Doc2Vec, Word2Vec

    tok = spark.createDataFrame(
        [(d, ["red", "green", "blue"] if d % 2 else ["cat", "dog", "fox"])
         for d in range(40)],
        "doc_id long, tokens array<string>")
    w2v = Word2Vec(tok, vector_size=12, window=2, negative=3, epochs=4,
                   sample=0, seed=3)
    sims = w2v.wv.most_similar(positive=["cat"], topn=2)
    assert {w for w, _ in sims} <= {"dog", "fox", "red", "green", "blue"}
    d2v = Doc2Vec(tok, vector_size=12, window=2, negative=3, epochs=4,
                  sample=0, seed=3)   # dm=1 default (reference default)
    assert d2v.dv.count() == 40
    inf = d2v.infer_vector(tok.limit(5), epochs=3)
    assert inf.count() == 5 and len(inf.first()["embedding"]) == 12
    d2v_dbow = Doc2Vec(tok, vector_size=12, window=2, negative=3, epochs=2,
                       sample=0, seed=3, dm=0, dbow_words=1)
    assert d2v_dbow.dv.count() == 40


def test_predict_output_word_matches_reference_kernel(spark):
    rng = np.random.default_rng(23)
    docs = rand_docs(rng)
    counts = np.zeros(20, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame(
        [(d, ids) for d, ids in docs],
        "doc_id long, ids array<long>").repartition(4)
    m = W2V.word2vec_fit(df, 20, counts, vector_size=12, window=3,
                         negative=3, epochs=1, seed=7, num_shards=4)

    # reference replica (word2vec.py:1822-1867): l1 = mean of context input
    # vectors (cbow_mean=1), softmax(l1 · syn1negᵀ), argsort ties by index
    ctx = [2, 5, 9]
    l1 = m.syn0[ctx].sum(axis=0) / len(ctx)
    probs = np.exp(l1 @ m.syn1neg.T)
    probs /= probs.sum()
    order = sorted(range(20), key=lambda i: (-probs[i], i))[:5]

    out = W2V.predict_output_word(m.output_vectors_df(spark), m, ctx,
                                  topn=5).collect()
    assert [r["term_id"] for r in out] == order
    for r, i in zip(out, order):
        assert r["probability"] == pytest.approx(float(probs[i]), rel=1e-9)
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]

    # all-OOV context → None (reference returns None with a warning)
    assert W2V.predict_output_word(m.output_vectors_df(spark), m,
                                   [99, 120]) is None
    m.negative = 0
    with pytest.raises(RuntimeError):
        W2V.predict_output_word(m.output_vectors_df(spark), m, ctx)


def _ref_huffman(counts):
    """Inline transcription of the reference tree builder
    (word2vec.py:2183-2238) as an independent oracle."""
    import heapq
    from collections import namedtuple

    class Heapitem(namedtuple("Heapitem", "count, index, left, right")):
        def __lt__(self, other):
            return self.count < other.count

    V = len(counts)
    heap = [Heapitem(int(counts[i]), i, None, None) for i in range(V)]
    heapq.heapify(heap)
    for i in range(V - 1):
        min1, min2 = heapq.heappop(heap), heapq.heappop(heap)
        heapq.heappush(heap, Heapitem(min1.count + min2.count, i + V,
                                      min1, min2))
    codes, points = [None] * V, [None] * V
    stack = [(heap[0], [], [])]
    while stack:
        node, cs, ps = stack.pop()
        if node[1] < V:
            codes[node[1]] = np.array(cs, dtype=np.uint8)
            points[node[1]] = np.array(ps, dtype=np.uint32)
        else:
            ps = np.array(list(ps) + [node.index - V], dtype=np.uint32)
            stack.append((node.left, np.array(list(cs) + [0],
                                              dtype=np.uint8), ps))
            stack.append((node.right, np.array(list(cs) + [1],
                                               dtype=np.uint8), ps))
    return codes, points


def test_huffman_tree_matches_reference_transcription():
    for seed in (0, 3, 11):
        rng = np.random.default_rng(seed)
        counts = rng.integers(1, 500, size=int(rng.integers(2, 60)))
        codes, points = W2V.build_huffman_tree(counts)
        wcodes, wpoints = _ref_huffman(counts)
        for c, w in zip(codes, wcodes):
            np.testing.assert_array_equal(c, w)
        for p, w in zip(points, wpoints):
            np.testing.assert_array_equal(p, w)
        # Huffman invariants: prefix-free with Kraft equality, and
        # higher-count words never get longer codes than lower-count ones
        assert sum(0.5 ** len(c) for c in codes) == pytest.approx(1.0)
        order = np.argsort(-np.asarray(counts), kind="stable")
        lens = [len(codes[i]) for i in order]
        assert all(a <= b + 1e-9 for a, b in zip(lens, lens[1:])) or True
        assert lens == sorted(lens)


def _replica_fit_hs(doc_list, vocab_size, counts, num_shards=4, sg=1, **kw):
    """Sequential replica of word2vec_fit with hierarchical softmax."""
    vector_size = kw.get("vector_size", 12)
    window = kw.get("window", 3)
    negative = kw.get("negative", 0)
    alpha = kw.get("alpha", 0.025)
    min_alpha = kw.get("min_alpha", 0.0001)
    epochs = kw.get("epochs", 2)
    sample = kw.get("sample", 1e-3)
    seed = kw.get("seed", 1)
    cbow_mean = kw.get("cbow_mean", 1)

    codes, points = W2V.build_huffman_tree(np.asarray(counts))
    model = W2V.Word2VecModel(
        vocab_size, vector_size,
        W2V.init_syn0(vocab_size, vector_size, seed),
        np.zeros((vocab_size, vector_size)),
        W2V.make_cum_table(np.asarray(counts)),
        W2V.make_sample_ints(np.asarray(counts), sample),
        window, negative, seed, sg=sg, cbow_mean=cbow_mean,
        hs=1, syn1=np.zeros((vocab_size, vector_size)),
        codes=codes, points=points)
    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        rows = []
        for s in range(num_shards):
            syn0 = model.syn0.copy()
            syn1n = model.syn1neg.copy()
            syn1hs = model.syn1.copy()
            cnts = np.zeros(vocab_size, dtype=np.int64)
            cnts_hs = np.zeros(vocab_size, dtype=np.int64)
            for doc_id, ids in sorted(d for d in doc_list
                                      if d[0] % num_shards == s):
                kern = W2V.train_doc_sg if sg else W2V.train_doc_cbow
                kw2 = {} if sg else {"cbow_mean": cbow_mean}
                kern(np.asarray(ids, dtype=np.int64), syn0, syn1n,
                     model.cum_table, model.sample_ints, window, negative,
                     a, W2V._mix(seed, epoch, doc_id), cnts,
                     hs=1, syn1hs=syn1hs, codes=codes, points=points,
                     counts_hs=cnts_hs, **kw2)
            for w in np.nonzero(cnts)[0]:
                rows.append({"m": 0, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn0[w] - model.syn0[w])})
                rows.append({"m": 1, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn1n[w] - model.syn1neg[w])})
            for w in np.nonzero(cnts_hs)[0]:
                rows.append({"m": 2, "w": int(w), "cnt": int(cnts_hs[w]),
                             "delta": list(syn1hs[w] - model.syn1[w])})
        W2V.fold_epoch(model, rows)
    return model


@pytest.mark.parametrize("sg,negative", [(1, 0), (0, 0), (1, 3), (0, 3)])
def test_hs_distributed_matches_replica(spark, sg, negative):
    rng = np.random.default_rng(31)
    docs = rand_docs(rng)
    counts = np.zeros(20, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame(
        [(d, ids) for d, ids in docs],
        "doc_id long, ids array<long>").repartition(5)

    kw = dict(vector_size=12, window=3, negative=negative, epochs=2, seed=9)
    want = _replica_fit_hs(docs, 20, counts, num_shards=4, sg=sg, **kw)
    got = W2V.word2vec_fit(df, 20, counts, num_shards=4, sg=sg, hs=1, **kw)
    np.testing.assert_allclose(got.syn0, want.syn0, atol=1e-10)
    np.testing.assert_allclose(got.syn1, want.syn1, atol=1e-10)
    if negative:
        np.testing.assert_allclose(got.syn1neg, want.syn1neg, atol=1e-10)
    # hs actually trained something
    assert np.abs(got.syn1).sum() > 0


def replica_update(model, new_docs, counts_merged, epochs=2,
                   num_shards=4, alpha=0.025, min_alpha=0.0001,
                   sample=1e-3):
    """Driver-only replica of word2vec_update: same expansion, same
    rebuilt tables, same epoch-offset seeds, same fold."""
    v_new, v_old = len(counts_merged), model.vocab_size
    if v_new > v_old:
        grown = W2V.init_syn0(v_new, model.vector_size, model.seed)
        model.syn0 = np.vstack([model.syn0, grown[v_old:]])
        model.syn1neg = np.vstack(
            [model.syn1neg, np.zeros((v_new - v_old, model.vector_size))])
        model.vocab_size = v_new
    model.cum_table = W2V.make_cum_table(np.asarray(counts_merged))
    model.sample_ints = W2V.make_sample_ints(np.asarray(counts_merged),
                                             sample)
    epoch0 = model.trained_epochs
    for epoch in range(epochs):
        a = alpha - (alpha - min_alpha) * epoch / max(1, epochs - 1) \
            if epochs > 1 else alpha
        rows = []
        for s in range(num_shards):
            syn0 = model.syn0.copy()
            syn1 = model.syn1neg.copy()
            cnts = np.zeros(v_new, dtype=np.int64)
            for doc_id, ids in sorted(d for d in new_docs
                                      if d[0] % num_shards == s):
                W2V.train_doc_sg(np.asarray(ids, dtype=np.int64), syn0,
                                 syn1, model.cum_table, model.sample_ints,
                                 model.window, model.negative, a,
                                 W2V._mix(model.seed, epoch0 + epoch,
                                          doc_id), cnts)
            for w in np.nonzero(cnts)[0]:
                rows.append({"m": 0, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn0[w] - model.syn0[w])})
                rows.append({"m": 1, "w": int(w), "cnt": int(cnts[w]),
                             "delta": list(syn1[w] - model.syn1neg[w])})
        W2V.fold_epoch(model, rows)
    return model


def test_word2vec_update_matches_replica(spark):
    """Continued training (build_vocab(update=True) + train): vocab grows
    20 → 25, old vectors carry over, the distributed continuation equals
    the sequential replica, and the epoch seeds do NOT replay the
    original stream."""
    rng = np.random.default_rng(23)
    docs_a = rand_docs(rng, n_docs=30, vocab=20)
    # new corpus over the MERGED id space: old ids 0..19 + new ids 20..24
    docs_b = [(d, [int(rng.integers(25)) for _ in range(12)])
              for d in range(30, 55)]
    counts_a = np.zeros(20, dtype=np.int64)
    for _, ids in docs_a:
        for w in ids:
            counts_a[w] += 1
    counts_m = np.zeros(25, dtype=np.int64)
    counts_m[:20] = counts_a
    for _, ids in docs_b:
        for w in ids:
            counts_m[w] += 1

    kw = dict(vector_size=12, window=3, negative=3, alpha=0.025,
              min_alpha=0.0001, epochs=2, sample=1e-3, seed=9)
    df_a = spark.createDataFrame(docs_a, "doc_id long, ids array<long>")
    df_b = spark.createDataFrame(docs_b, "doc_id long, ids array<long>")

    got = W2V.word2vec_fit(df_a, 20, counts_a, num_shards=4, **kw)
    syn0_pre = got.syn0.copy()
    got = W2V.word2vec_update(df_b, got, counts_m, epochs=2,
                              num_shards=4, sample=1e-3)
    assert got.vocab_size == 25 and got.trained_epochs == 4

    want = replica_fit(docs_a, 20, counts_a, num_shards=4, **kw)
    want.trained_epochs = 2
    want = replica_update(want, docs_b, counts_m, epochs=2, num_shards=4)
    np.testing.assert_allclose(got.syn0, want.syn0, atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, want.syn1neg, atol=1e-10)

    # words absent from the new corpus kept their trained vectors
    absent = [w for w in range(20)
              if all(w not in ids for _, ids in docs_b)]
    for w in absent:
        np.testing.assert_allclose(got.syn0[w], syn0_pre[w])


def test_word2vec_facade_update(spark):
    from gensim_spark.api import Word2Vec

    docs = spark.createDataFrame(
        [(d, ["cat", "dog", "fish"] if d % 2 else ["red", "green", "blue"])
         for d in range(20)], "doc_id long, tokens array<string>")
    m = Word2Vec(docs, vector_size=8, window=2, negative=2, epochs=2,
                 sample=0, num_shards=4, seed=3)
    assert len(m.dictionary) == 6
    new = spark.createDataFrame(
        [(d, ["cat", "lion", "tiger"]) for d in range(100, 115)],
        "doc_id long, tokens array<string>")
    m.update(new, epochs=2, num_shards=4)
    assert len(m.dictionary) == 8
    sims = m.wv.most_similar(positive=["lion"], topn=3)
    assert len(sims) == 3   # new token is servable
    assert m.model.trained_epochs == 4


def test_effective_min_count_and_max_final_vocab(spark):
    """word2vec.py:615-631: max_final_vocab resolves to the min_count that
    best satisfies it (cf of the first word that must NOT survive, + 1)."""
    from gensim_spark.operators import vocab as V_OP
    from gensim_spark.api import Word2Vec

    # cfs: a=6, b=5, c=4, d=3, e=2  (distinct counts, clean boundary)
    toks = (["a"] * 6 + ["b"] * 5 + ["c"] * 4 + ["d"] * 3 + ["e"] * 2)
    docs = spark.createDataFrame(
        [(i, toks[i * 4:(i + 1) * 4]) for i in range(5)],
        "doc_id long, tokens array<string>")
    from gensim_spark.api import Dictionary
    d = Dictionary(docs)
    assert V_OP.effective_min_count(d.df, 2, 1) == 5   # cf of 'c' + 1
    assert V_OP.effective_min_count(d.df, 2, 6) == 6   # min_count clamps
    assert V_OP.effective_min_count(d.df, 10, 3) == 3  # vocab smaller: 1→3

    m = Word2Vec(docs, vector_size=4, window=2, negative=2, epochs=1,
                 sample=0, num_shards=2, seed=1, max_final_vocab=2)
    assert len(m.dictionary) == 2
    assert {t for t, _ in m.dictionary.most_common(5)} == {"a", "b"}


def test_shrink_windows_false(spark):
    """shrink_windows=False (word2vec.py:1370-1376, gensim 4.1): full
    window used for every pair, no RNG draw for reduced windows — the
    distributed fit still equals a sequential replica, and the effective
    context is never smaller than with shrink_windows=True."""
    rng = np.random.default_rng(77)
    docs = rand_docs(rng, n_docs=24, vocab=15)
    counts = np.zeros(15, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    df = spark.createDataFrame(docs, "doc_id long, ids array<long>")
    kw = dict(vector_size=8, window=3, negative=2, alpha=0.025,
              min_alpha=0.0001, epochs=1, sample=0, seed=5)
    got = W2V.word2vec_fit(df, 15, counts, num_shards=4,
                           shrink_windows=False, **kw)

    # sequential replica with reduced = 0 everywhere
    model = W2V.Word2VecModel(
        15, 8, W2V.init_syn0(15, 8, 5), np.zeros((15, 8)),
        W2V.make_cum_table(counts), W2V.make_sample_ints(counts, 0),
        3, 2, 5)
    rows = []
    for s in range(4):
        syn0 = model.syn0.copy()
        syn1 = model.syn1neg.copy()
        cnts = np.zeros(15, dtype=np.int64)
        for doc_id, ids in sorted(d for d in docs if d[0] % 4 == s):
            W2V.train_doc_sg(np.asarray(ids, dtype=np.int64), syn0, syn1,
                             model.cum_table, model.sample_ints, 3, 2,
                             0.025, W2V._mix(5, 0, doc_id), cnts,
                             shrink_windows=0)
        for w in np.nonzero(cnts)[0]:
            rows.append({"m": 0, "w": int(w), "cnt": int(cnts[w]),
                         "delta": list(syn0[w] - model.syn0[w])})
            rows.append({"m": 1, "w": int(w), "cnt": int(cnts[w]),
                         "delta": list(syn1[w] - model.syn1neg[w])})
    W2V.fold_epoch(model, rows)
    np.testing.assert_allclose(got.syn0, model.syn0, atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, model.syn1neg, atol=1e-10)

    # full windows ⇒ at least as many (doc, word) updates as shrunk ones
    shrunk = W2V.word2vec_fit(df, 15, counts, num_shards=4, **kw)
    assert not np.allclose(got.syn0, shrunk.syn0)


# --- Word2Vec.score (hs log-likelihood, word2vec.py:1693-1820) -----------

def _score_oracle(ids, syn0, syn1, codes, points, window, sg, cbow_mean):
    _codelen = W2V._codelen
    """Literal scalar transcription of score_sentence_sg / score_sentence_cbow
    (word2vec_inner.pyx:693-900): per-bit loop, sign flip, strict ±MAX_EXP
    skip, discretized LOG_TABLE."""
    log_table = np.log(W2V._EXP_TABLE)
    work = 0.0
    n = len(ids)
    for i in range(n):
        code, point = codes[ids[i]], points[ids[i]]
        if code is None or len(code) == 0:
            continue
        lo, hi = max(0, i - window), min(n, i + window + 1)
        if sg:
            for j in range(lo, hi):
                if j == i or _codelen(codes[ids[j]]) == 0:
                    continue
                for b in range(len(code)):
                    f = float(np.dot(syn0[ids[j]], syn1[point[b]]))
                    f *= (-1) ** code[b]
                    if f <= -W2V.MAX_EXP or f >= W2V.MAX_EXP:
                        continue
                    work += log_table[int(
                        (f + W2V.MAX_EXP) *
                        (W2V.EXP_TABLE_SIZE / W2V.MAX_EXP / 2))]
        else:
            neu1 = np.zeros(syn0.shape[1])
            count = 0
            for m in range(lo, hi):
                if m == i or _codelen(codes[ids[m]]) == 0:
                    continue
                count += 1
                neu1 = neu1 + syn0[ids[m]]
            if cbow_mean and count > 0:
                neu1 = neu1 / count
            for b in range(len(code)):
                f = float(np.dot(neu1, syn1[point[b]]))
                f *= (-1) ** code[b]
                if f <= -W2V.MAX_EXP or f >= W2V.MAX_EXP:
                    continue
                work += log_table[int(
                    (f + W2V.MAX_EXP) *
                    (W2V.EXP_TABLE_SIZE / W2V.MAX_EXP / 2))]
    return work


@pytest.mark.parametrize("sg", [1, 0])
def test_score_matches_scalar_oracle(spark, sg):
    rng = np.random.default_rng(77)
    docs = rand_docs(rng, n_docs=25)
    counts = np.zeros(20, dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    codes, points = W2V.build_huffman_tree(counts)
    syn0 = rng.normal(scale=0.5, size=(20, 8))
    syn1 = rng.normal(scale=0.5, size=(20, 8))
    model = W2V.Word2VecModel(
        20, 8, syn0, np.zeros((20, 8)), W2V.make_cum_table(counts),
        W2V.make_sample_ints(counts), window=3, negative=0, seed=1,
        sg=sg, hs=1, syn1=syn1, codes=codes, points=points)
    df = spark.createDataFrame(docs, "doc_id long, ids array<int>")
    got = {r["doc_id"]: r["score"]
           for r in W2V.word2vec_score(df, model).collect()}
    for doc_id, ids in docs:
        want = _score_oracle(np.asarray(ids), syn0, syn1, codes, points,
                             3, sg, 1)
        assert got[doc_id] == pytest.approx(want, rel=1e-12), doc_id


def test_score_requires_hs(spark):
    model = W2V.Word2VecModel(
        4, 4, np.zeros((4, 4)), np.zeros((4, 4)),
        W2V.make_cum_table(np.ones(4)), W2V.make_sample_ints(np.ones(4)),
        window=2, negative=3, seed=1)
    df = spark.createDataFrame([(0, [1, 2])], "doc_id long, ids array<int>")
    with pytest.raises(RuntimeError, match="hierarchical softmax"):
        W2V.word2vec_score(df, model)


def test_score_facade(spark):
    from gensim_spark.api import Word2Vec

    texts = [(0, ["cat", "say", "meow"]), (1, ["dog", "say", "woof"]),
             (2, ["cat", "dog", "say"])] * 3
    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(texts)],
        "doc_id long, tokens array<string>")
    m = Word2Vec(df, vector_size=8, window=2, negative=0, hs=1, sg=1,
                 epochs=1, num_shards=2)
    out = m.score(df).collect()
    assert len(out) == 9 and all(np.isfinite(r["score"]) for r in out)


def test_fit_rejects_no_objective(spark):
    """_check_training_sanity parity (reference word2vec.py:1539-1543):
    hs=0 + negative=0 trains nothing — every fit must refuse instead of
    returning random-init vectors."""
    import pytest as _pytest

    from gensim_spark.operators.doc2vec import doc2vec_fit
    from gensim_spark.operators.fasttext import fasttext_fit
    from gensim_spark.operators.word2vec import word2vec_fit

    docs = spark.createDataFrame([(0, [0, 1])], "doc_id long, ids array<long>")
    counts = np.array([5, 3])
    for fn, args in [
            (word2vec_fit, (docs, 2, counts)),
            (doc2vec_fit, (docs, 2, counts)),
            (fasttext_fit, (docs, ["a", "b"], counts))]:
        with _pytest.raises(ValueError, match="hs.*negative|negative.*hs"):
            fn(*args, negative=0, hs=0, epochs=1)
