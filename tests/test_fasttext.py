"""FastText: n-gram/hash goldens from the reference test suite, distributed
fit vs a sequential replica, subword OOV semantics."""
import numpy as np
import pytest

from gensim_spark.operators import fasttext as FT
from gensim_spark.operators import word2vec as W2V


def test_compute_ngrams_bytes_reference_goldens():
    # gensim/test/test_fasttext.py:1319-1356 expected_bytes fixtures
    assert FT.compute_ngrams_bytes("test", 3, 5) == [
        b"<te", b"<tes", b"<test", b"tes", b"test", b"test>",
        b"est", b"est>", b"st>"]
    assert FT.compute_ngrams_bytes("at the", 3, 5) == [
        b"<at", b"<at ", b"<at t", b"at ", b"at t", b"at th", b"t t",
        b"t th", b"t the", b" th", b" the", b" the>", b"the", b"the>",
        b"he>"]
    assert FT.compute_ngrams_bytes("тест", 3, 5) == [
        b"<\xd1\x82\xd0\xb5", b"<\xd1\x82\xd0\xb5\xd1\x81",
        b"<\xd1\x82\xd0\xb5\xd1\x81\xd1\x82",
        b"\xd1\x82\xd0\xb5\xd1\x81", b"\xd1\x82\xd0\xb5\xd1\x81\xd1\x82",
        b"\xd1\x82\xd0\xb5\xd1\x81\xd1\x82>",
        b"\xd0\xb5\xd1\x81\xd1\x82", b"\xd0\xb5\xd1\x81\xd1\x82>",
        b"\xd1\x81\xd1\x82>"]
    assert FT.compute_ngrams_bytes("試し", 3, 5) == [
        b"<\xe8\xa9\xa6\xe3\x81\x97", b"<\xe8\xa9\xa6\xe3\x81\x97>",
        b"\xe8\xa9\xa6\xe3\x81\x97>"]
    # text variant round-trip (same sets, test_fasttext.py:1377-1379)
    got_text = sorted(n.decode("utf-8")
                      for n in FT.compute_ngrams_bytes("test", 3, 5))
    assert got_text == sorted(
        ["<te", "tes", "est", "st>", "<tes", "test", "est>", "<test",
         "test>"])


def test_ft_hash_fnv1a_signed_quirk():
    # independent FNV-1a with signed-char XOR (Facebook dictionary.cc)
    def ref(bz):
        h = 2166136261
        for b in bz:
            signed = b - 256 if b >= 128 else b  # int8 view of the byte
            h ^= signed & 0xFFFFFFFF             # sign-extend to uint32
            h = (h * 16777619) & 0xFFFFFFFF
        return h

    for w in [b"test", b"<te", "тест".encode("utf-8"), b"\xff\x80ab"]:
        assert FT.ft_hash_bytes(w) == ref(w)
    # high-bit bytes must sign-extend: differs from the unsigned variant
    def unsigned(bz):
        h = 2166136261
        for b in bz:
            h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        return h
    assert FT.ft_hash_bytes("тест".encode("utf-8")) != \
        unsigned("тест".encode("utf-8"))


def _toy_corpus(rng, vocab_tokens, n_docs=60):
    docs = []
    for d in range(n_docs):
        comm = d % 2
        half = len(vocab_tokens) // 2
        ids = [int(half * comm + rng.integers(half)) for _ in range(15)]
        docs.append((d, ids))
    counts = np.zeros(len(vocab_tokens), dtype=np.int64)
    for _, ids in docs:
        for w in ids:
            counts[w] += 1
    return docs, counts


def test_fasttext_fit_matches_replica(spark):
    rng = np.random.default_rng(41)
    vocab_tokens = ["apple", "apples", "banana", "bananas", "cherry",
                    "stone", "stones", "rock", "rocks", "cliff"]
    docs, counts = _toy_corpus(rng, vocab_tokens)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>").repartition(5)
    kw = dict(vector_size=10, window=3, negative=3, epochs=2, sample=0,
              bucket=500, min_n=3, max_n=5, seed=6)
    got = FT.fasttext_fit(df, vocab_tokens, counts, num_shards=4, **kw)

    # sequential replica: same shards, seeds, kernels, fold
    subs = [FT.ft_ngram_hashes(t, 3, 5, 500) for t in vocab_tokens]
    model = FT.FastTextModel(
        10, 10, 500, W2V.init_syn0(10, 10, 6),
        W2V.init_syn0(500, 10, W2V._mix(6, 77)), np.zeros((10, 10)),
        W2V.make_cum_table(counts), W2V.make_sample_ints(counts, 0),
        subs, 3, 3, 3, 5, 6)
    for epoch in range(2):
        a = 0.025 - (0.025 - 0.0001) * epoch / 1
        mats = {0: model.syn0_vocab, 1: model.syn0_ngrams, 2: model.syn1neg}
        num, den = {0: {}, 1: {}, 2: {}}, {0: {}, 1: {}, 2: {}}
        for s in range(4):
            v0 = model.syn0_vocab.copy()
            n0 = model.syn0_ngrams.copy()
            o0 = model.syn1neg.copy()
            cv = np.zeros(10, dtype=np.int64)
            cn = np.zeros(500, dtype=np.int64)
            co = np.zeros(10, dtype=np.int64)
            for doc_id, ids in sorted(d for d in docs if d[0] % 4 == s):
                FT.train_doc_ft_sg(np.asarray(ids), subs, v0, n0, o0,
                                   model.cum_table, model.sample_ints,
                                   3, 3, a, W2V._mix(6, epoch, doc_id),
                                   cv, cn, co)
            for m, (base, mat, cnts) in enumerate(
                    [(model.syn0_vocab, v0, cv),
                     (model.syn0_ngrams, n0, cn),
                     (model.syn1neg, o0, co)]):
                for w in np.nonzero(cnts)[0]:
                    d_ = (mat[w] - base[w]) * cnts[w]
                    if w in num[m]:
                        num[m][w] += d_
                        den[m][w] += cnts[w]
                    else:
                        num[m][w] = d_
                        den[m][w] = int(cnts[w])
        for m, mat in mats.items():
            for w, d_ in num[m].items():
                mat[w] += d_ / den[m][w]

    np.testing.assert_allclose(got.syn0_vocab, model.syn0_vocab, atol=1e-10)
    np.testing.assert_allclose(got.syn0_ngrams, model.syn0_ngrams,
                               atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, model.syn1neg, atol=1e-10)


def test_fasttext_cbow_fit_matches_replica(spark):
    """sg=0 CBOW (the reference constructor default) through the same
    shard-sync protocol, pinned against a sequential replica of
    fasttext_fast_sentence_cbow_neg."""
    rng = np.random.default_rng(17)
    vocab_tokens = ["apple", "apples", "banana", "bananas", "cherry",
                    "stone", "stones", "rock", "rocks", "cliff"]
    docs, counts = _toy_corpus(rng, vocab_tokens)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>").repartition(5)
    got = FT.fasttext_fit(df, vocab_tokens, counts, vector_size=10,
                          window=3, negative=3, epochs=2, sample=0,
                          bucket=500, min_n=3, max_n=5, seed=6,
                          num_shards=4, sg=0)

    subs = [FT.ft_ngram_hashes(t, 3, 5, 500) for t in vocab_tokens]
    model = FT.FastTextModel(
        10, 10, 500, W2V.init_syn0(10, 10, 6),
        W2V.init_syn0(500, 10, W2V._mix(6, 77)), np.zeros((10, 10)),
        W2V.make_cum_table(counts), W2V.make_sample_ints(counts, 0),
        subs, 3, 3, 3, 5, 6)
    for epoch in range(2):
        a = 0.025 - (0.025 - 0.0001) * epoch / 1
        mats = {0: model.syn0_vocab, 1: model.syn0_ngrams, 2: model.syn1neg}
        num, den = {0: {}, 1: {}, 2: {}}, {0: {}, 1: {}, 2: {}}
        for s in range(4):
            v0 = model.syn0_vocab.copy()
            n0 = model.syn0_ngrams.copy()
            o0 = model.syn1neg.copy()
            cv = np.zeros(10, dtype=np.int64)
            cn = np.zeros(500, dtype=np.int64)
            co = np.zeros(10, dtype=np.int64)
            for doc_id, ids in sorted(d for d in docs if d[0] % 4 == s):
                FT.train_doc_ft_cbow(np.asarray(ids), subs, v0, n0, o0,
                                     model.cum_table, model.sample_ints,
                                     3, 3, a, W2V._mix(6, epoch, doc_id),
                                     cv, cn, co)
            for m, (base, mat, cnts) in enumerate(
                    [(model.syn0_vocab, v0, cv),
                     (model.syn0_ngrams, n0, cn),
                     (model.syn1neg, o0, co)]):
                for w in np.nonzero(cnts)[0]:
                    d_ = (mat[w] - base[w]) * cnts[w]
                    if w in num[m]:
                        num[m][w] += d_
                        den[m][w] += cnts[w]
                    else:
                        num[m][w] = d_
                        den[m][w] = int(cnts[w])
        for m, mat in mats.items():
            for w, d_ in num[m].items():
                mat[w] += d_ / den[m][w]

    np.testing.assert_allclose(got.syn0_vocab, model.syn0_vocab, atol=1e-10)
    np.testing.assert_allclose(got.syn0_ngrams, model.syn0_ngrams,
                               atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, model.syn1neg, atol=1e-10)


@pytest.mark.parametrize("sg,negative", [(1, 3), (0, 3), (1, 0)])
def test_fasttext_hs_fit_matches_replica(spark, sg, negative):
    """hs=1 through both FastText kernels (fasttext_fast_sentence_sg_hs /
    cbow_hs): composed with negative sampling (both stages run when both
    are set, the neg stage recomposing its projection from the hs-updated
    rows) and hs-only (negative=0 skips the whole neg stage)."""
    rng = np.random.default_rng(23)
    vocab_tokens = ["apple", "apples", "banana", "bananas", "cherry",
                    "stone", "stones", "rock", "rocks", "cliff"]
    docs, counts = _toy_corpus(rng, vocab_tokens)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>").repartition(5)
    got = FT.fasttext_fit(df, vocab_tokens, counts, vector_size=10,
                          window=3, negative=negative, epochs=2, sample=0,
                          bucket=500, min_n=3, max_n=5, seed=6,
                          num_shards=4, sg=sg, hs=1)

    subs = [FT.ft_ngram_hashes(t, 3, 5, 500) for t in vocab_tokens]
    codes, points = W2V.build_huffman_tree(counts)
    model = FT.FastTextModel(
        10, 10, 500, W2V.init_syn0(10, 10, 6),
        W2V.init_syn0(500, 10, W2V._mix(6, 77)), np.zeros((10, 10)),
        W2V.make_cum_table(counts), W2V.make_sample_ints(counts, 0),
        subs, 3, negative, 3, 5, 6,
        hs=1, syn1=np.zeros((10, 10)), codes=codes, points=points)
    kernel = FT.train_doc_ft_sg if sg else FT.train_doc_ft_cbow
    for epoch in range(2):
        a = 0.025 - (0.025 - 0.0001) * epoch / 1
        mats = {0: model.syn0_vocab, 1: model.syn0_ngrams,
                2: model.syn1neg, 3: model.syn1}
        num = {m: {} for m in mats}
        den = {m: {} for m in mats}
        for s in range(4):
            v0 = model.syn0_vocab.copy()
            n0 = model.syn0_ngrams.copy()
            o0 = model.syn1neg.copy()
            h0 = model.syn1.copy()
            cv = np.zeros(10, dtype=np.int64)
            cn = np.zeros(500, dtype=np.int64)
            co = np.zeros(10, dtype=np.int64)
            ch = np.zeros(10, dtype=np.int64)
            for doc_id, ids in sorted(d for d in docs if d[0] % 4 == s):
                kernel(np.asarray(ids), subs, v0, n0, o0,
                       model.cum_table, model.sample_ints,
                       3, negative, a, W2V._mix(6, epoch, doc_id),
                       cv, cn, co, hs=1, syn1hs=h0, codes=codes,
                       points=points, counts_h=ch)
            for m, (base, mat, cnts) in enumerate(
                    [(model.syn0_vocab, v0, cv),
                     (model.syn0_ngrams, n0, cn),
                     (model.syn1neg, o0, co),
                     (model.syn1, h0, ch)]):
                for w in np.nonzero(cnts)[0]:
                    d_ = (mat[w] - base[w]) * cnts[w]
                    if w in num[m]:
                        num[m][w] += d_
                        den[m][w] += cnts[w]
                    else:
                        num[m][w] = d_
                        den[m][w] = int(cnts[w])
        for m, mat in mats.items():
            for w, d_ in num[m].items():
                mat[w] += d_ / den[m][w]

    np.testing.assert_allclose(got.syn0_vocab, model.syn0_vocab, atol=1e-10)
    np.testing.assert_allclose(got.syn0_ngrams, model.syn0_ngrams,
                               atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, model.syn1neg, atol=1e-10)
    np.testing.assert_allclose(got.syn1, model.syn1, atol=1e-10)
    assert np.abs(got.syn1).sum() > 0        # the hs matrix actually trained
    if negative == 0:
        assert np.abs(got.syn1neg).sum() == 0  # neg stage fully skipped


def test_ft_cbow_kernel_semantics():
    """Kernel-level quirks vs the SG kernel: context sum counts words AND
    subwords; saturation clamps instead of skipping; cbow_mean=0 scales the
    applied error by inv_count."""
    rng = np.random.default_rng(3)
    V, B, D = 4, 20, 6
    subs = [[int(x) for x in rng.integers(0, B, size=2)] for _ in range(V)]
    counts = np.array([5, 4, 3, 2], dtype=np.int64)
    cum = W2V.make_cum_table(counts)
    samp = W2V.make_sample_ints(counts, 0)
    ids = np.array([0, 1, 2, 3], dtype=np.int64)

    def run(cbow_mean, scale=1.0):
        v = W2V.init_syn0(V, D, 1) * scale
        n = W2V.init_syn0(B, D, 2) * scale
        o = W2V.init_syn0(V, D, 3) * scale
        cv = np.zeros(V, dtype=np.int64)
        cn = np.zeros(B, dtype=np.int64)
        co = np.zeros(V, dtype=np.int64)
        FT.train_doc_ft_cbow(ids, subs, v, n, o, cum, samp, 2, 2, 0.05,
                             99, cv, cn, co, cbow_mean=cbow_mean)
        return v, n, o, cv, cn, co

    v1, n1, o1, cv1, cn1, co1 = run(1)
    v0, n0, o0, *_ = run(0)
    # both modes train (matrices move) and differ from each other
    assert cv1.sum() > 0 and cn1.sum() > 0 and co1.sum() > 0
    assert not np.allclose(v1, v0)
    # saturation path: huge vectors → f clamps to 0/1, updates still apply
    vs, ns, os_, cvs, _, cos_ = run(1, scale=200.0)
    assert cos_.sum() > 0 and cvs.sum() > 0  # no sample was skipped


def test_adjusted_and_oov_vectors(spark):
    rng = np.random.default_rng(7)
    vocab_tokens = ["apple", "apples", "grape"]
    docs, counts = _toy_corpus(rng, vocab_tokens + ["x", "y", "z"],
                               n_docs=20)
    vocab_tokens = vocab_tokens + ["x", "y", "z"]
    counts = np.maximum(counts, 1)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m = FT.fasttext_fit(df, vocab_tokens, counts, vector_size=8, window=2,
                        negative=2, epochs=1, sample=0, bucket=200,
                        min_n=3, max_n=4, num_shards=2, seed=9)
    adj = m.adjusted_vectors()
    w = 0
    want = m.syn0_vocab[w].copy()
    for nh in m.subwords[w]:
        want += m.syn0_ngrams[nh]
    want /= len(m.subwords[w]) + 1
    np.testing.assert_allclose(adj[w], want, atol=1e-12)

    # OOV: mean of ngram bucket vectors; shares subwords with 'apples'
    oov = m.oov_vector("applez")
    hashes = FT.ft_ngram_hashes("applez", 3, 4, 200)
    want_oov = sum(m.syn0_ngrams[nh] for nh in hashes) / len(hashes)
    np.testing.assert_allclose(oov, want_oov, atol=1e-12)
    assert np.linalg.norm(m.oov_vector("")) == 0 or True  # no crash


def test_oov_morphology_similarity(spark):
    # OOV 'stonez' should be closer to 'stones' than to 'banana' because
    # they share character n-grams
    rng = np.random.default_rng(11)
    vocab_tokens = ["stone", "stones", "stoned", "banana", "bananas",
                    "melon"]
    docs, counts = _toy_corpus(rng, vocab_tokens, n_docs=80)
    df = spark.createDataFrame([(d, ids) for d, ids in docs],
                               "doc_id long, ids array<long>")
    m = FT.fasttext_fit(df, vocab_tokens, counts, vector_size=12, window=3,
                        negative=3, epochs=3, sample=0, bucket=2000,
                        num_shards=4, seed=3)
    adj = m.adjusted_vectors()

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    oov = m.oov_vector("stonez")
    assert cos(oov, adj[1]) > cos(oov, adj[3])


def test_facade(spark):
    from gensim_spark.api import FastText

    tok = spark.createDataFrame(
        [(d, ["red", "green", "blue"] if d % 2 else ["cat", "cats", "dog"])
         for d in range(30)],
        "doc_id long, tokens array<string>")
    ft = FastText(tok, vector_size=10, window=2, negative=2, epochs=2,
                  sample=0, bucket=300, num_shards=4, seed=2)
    sims = ft.wv.most_similar(positive=["cat"], topn=2)
    assert len(sims) == 2
    v = ft.get_vector("catz")  # OOV via subwords
    assert v.shape == (10,) and np.linalg.norm(v) > 0
    v2 = ft.get_vector("cat")  # in-vocab: adjusted vector
    assert v2.shape == (10,)


def test_fasttext_update_matches_replica(spark):
    """Continued training: vocab grows, new tokens get seeded init + fresh
    subword lists, the bucket matrix carries over, the distributed
    continuation equals a sequential replica with offset epoch seeds."""
    rng = np.random.default_rng(31)
    vocab_a = ["apple", "apples", "banana", "bananas", "cherry"]
    docs_a, counts_a = _toy_corpus(rng, vocab_a, n_docs=30)
    vocab_m = vocab_a + ["cherries", "grape"]
    docs_b = [(d, [int(rng.integers(len(vocab_m))) for _ in range(10)])
              for d in range(30, 50)]
    counts_m = np.zeros(len(vocab_m), dtype=np.int64)
    counts_m[:5] = counts_a
    for _, ids in docs_b:
        for w in ids:
            counts_m[w] += 1

    kw = dict(vector_size=8, window=3, negative=3, epochs=2, sample=0,
              bucket=400, min_n=3, max_n=5, seed=12)
    df_a = spark.createDataFrame(docs_a, "doc_id long, ids array<long>")
    df_b = spark.createDataFrame(docs_b, "doc_id long, ids array<long>")
    got = FT.fasttext_fit(df_a, vocab_a, counts_a, num_shards=4, **kw)
    ngrams_pre = got.syn0_ngrams.copy()
    got = FT.fasttext_update(df_b, got, vocab_m, counts_m, epochs=2,
                             sample=0, num_shards=4)
    assert got.vocab_size == 7 and got.trained_epochs == 4
    assert len(got.subwords) == 7

    # sequential replica: same expansion, same offset seeds, same fold
    subs = [FT.ft_ngram_hashes(t, 3, 5, 400) for t in vocab_a]
    model = FT.FastTextModel(
        5, 8, 400, W2V.init_syn0(5, 8, 12),
        W2V.init_syn0(400, 8, W2V._mix(12, 77)), np.zeros((5, 8)),
        W2V.make_cum_table(counts_a), W2V.make_sample_ints(counts_a, 0),
        subs, 3, 3, 3, 5, 12)

    def run_epochs(doc_list, epoch0, epochs, subs_l):
        for epoch in range(epochs):
            a = 0.025 - (0.025 - 0.0001) * epoch / 1
            V = model.syn0_vocab.shape[0]
            num, den = {0: {}, 1: {}, 2: {}}, {0: {}, 1: {}, 2: {}}
            for s in range(4):
                v0 = model.syn0_vocab.copy()
                n0 = model.syn0_ngrams.copy()
                o0 = model.syn1neg.copy()
                cv = np.zeros(V, dtype=np.int64)
                cn = np.zeros(400, dtype=np.int64)
                co = np.zeros(V, dtype=np.int64)
                for doc_id, ids in sorted(d for d in doc_list
                                          if d[0] % 4 == s):
                    FT.train_doc_ft_sg(np.asarray(ids), subs_l, v0, n0, o0,
                                       model.cum_table, model.sample_ints,
                                       3, 3, a,
                                       W2V._mix(12, epoch0 + epoch, doc_id),
                                       cv, cn, co)
                for m, (base, mat, cnts) in enumerate(
                        [(model.syn0_vocab, v0, cv),
                         (model.syn0_ngrams, n0, cn),
                         (model.syn1neg, o0, co)]):
                    for w in np.nonzero(cnts)[0]:
                        d_ = (mat[w] - base[w]) * cnts[w]
                        if w in num[m]:
                            num[m][w] += d_
                            den[m][w] += cnts[w]
                        else:
                            num[m][w] = d_
                            den[m][w] = int(cnts[w])
            mats = {0: model.syn0_vocab, 1: model.syn0_ngrams,
                    2: model.syn1neg}
            for m, mat in mats.items():
                for w, d_ in num[m].items():
                    mat[w] += d_ / den[m][w]

    run_epochs(docs_a, 0, 2, subs)
    grown = W2V.init_syn0(7, 8, 12)
    model.syn0_vocab = np.vstack([model.syn0_vocab, grown[5:]])
    model.syn1neg = np.vstack([model.syn1neg, np.zeros((2, 8))])
    subs_m = subs + [FT.ft_ngram_hashes(t, 3, 5, 400) for t in vocab_m[5:]]
    model.cum_table = W2V.make_cum_table(counts_m)
    model.sample_ints = W2V.make_sample_ints(counts_m, 0)
    run_epochs(docs_b, 2, 2, subs_m)

    np.testing.assert_allclose(got.syn0_vocab, model.syn0_vocab, atol=1e-10)
    np.testing.assert_allclose(got.syn0_ngrams, model.syn0_ngrams,
                               atol=1e-10)
    np.testing.assert_allclose(got.syn1neg, model.syn1neg, atol=1e-10)
    # bucket rows untouched by either corpus kept their round-1 state
    touched = set()
    for s_l in subs_m:
        touched.update(s_l)
    untouched = [b for b in range(400) if b not in touched]
    if untouched:
        np.testing.assert_allclose(got.syn0_ngrams[untouched],
                                   ngrams_pre[untouched])


def test_fasttext_facade_update(spark):
    from gensim_spark.api import FastText

    docs = spark.createDataFrame(
        [(d, ["cat", "cats", "dog"] if d % 2 else ["red", "green", "blue"])
         for d in range(20)], "doc_id long, tokens array<string>")
    ft = FastText(docs, vector_size=8, window=2, negative=2, epochs=1,
                  sample=0, bucket=300, num_shards=4, seed=2, sg=1)
    assert len(ft.dictionary) == 6
    new = spark.createDataFrame(
        [(d, ["cat", "kitten", "kittens"]) for d in range(100, 112)],
        "doc_id long, tokens array<string>")
    ft.update(new, epochs=1, sample=0, num_shards=4)
    assert len(ft.dictionary) == 8
    assert ft.get_vector("kitten").shape == (8,)
    sims = ft.wv.most_similar(positive=["kitten"], topn=3)
    assert len(sims) == 3


def test_ft_shrink_windows_false(spark):
    """shrink_windows=False: full windows, no reduced draw; distributed ==
    replica with reduced = 0."""
    rng = np.random.default_rng(8)
    vocab_tokens = ["apple", "apples", "banana", "melon"]
    docs, counts = _toy_corpus(rng, vocab_tokens, n_docs=20)
    df = spark.createDataFrame(docs, "doc_id long, ids array<long>")
    got = FT.fasttext_fit(df, vocab_tokens, counts, vector_size=6,
                          window=2, negative=2, epochs=1, sample=0,
                          bucket=200, min_n=3, max_n=4, seed=4,
                          num_shards=2, shrink_windows=False)
    shrunk = FT.fasttext_fit(df, vocab_tokens, counts, vector_size=6,
                             window=2, negative=2, epochs=1, sample=0,
                             bucket=200, min_n=3, max_n=4, seed=4,
                             num_shards=2)
    assert not np.allclose(got.syn0_vocab, shrunk.syn0_vocab)

    subs = [FT.ft_ngram_hashes(t, 3, 4, 200) for t in vocab_tokens]
    model = FT.FastTextModel(
        4, 6, 200, W2V.init_syn0(4, 6, 4),
        W2V.init_syn0(200, 6, W2V._mix(4, 77)), np.zeros((4, 6)),
        W2V.make_cum_table(counts), W2V.make_sample_ints(counts, 0),
        subs, 2, 2, 3, 4, 4)
    num, den = {0: {}, 1: {}, 2: {}}, {0: {}, 1: {}, 2: {}}
    for s in range(2):
        v0 = model.syn0_vocab.copy()
        n0 = model.syn0_ngrams.copy()
        o0 = model.syn1neg.copy()
        cv = np.zeros(4, dtype=np.int64)
        cn = np.zeros(200, dtype=np.int64)
        co = np.zeros(4, dtype=np.int64)
        for doc_id, ids in sorted(d for d in docs if d[0] % 2 == s):
            FT.train_doc_ft_sg(np.asarray(ids), subs, v0, n0, o0,
                               model.cum_table, model.sample_ints,
                               2, 2, 0.025, W2V._mix(4, 0, doc_id),
                               cv, cn, co, shrink_windows=0)
        for m, (base, mat, cnts) in enumerate(
                [(model.syn0_vocab, v0, cv),
                 (model.syn0_ngrams, n0, cn),
                 (model.syn1neg, o0, co)]):
            for w in np.nonzero(cnts)[0]:
                d_ = (mat[w] - base[w]) * cnts[w]
                if w in num[m]:
                    num[m][w] += d_
                    den[m][w] += cnts[w]
                else:
                    num[m][w] = d_
                    den[m][w] = int(cnts[w])
    for m, mat in {0: model.syn0_vocab, 1: model.syn0_ngrams,
                   2: model.syn1neg}.items():
        for w, d_ in num[m].items():
            mat[w] += d_ / den[m][w]
    np.testing.assert_allclose(got.syn0_vocab, model.syn0_vocab, atol=1e-10)


def test_vectors_for_all_infers_oov(spark):
    """FastText.vectors_for_all: OOV keys inferred from n-grams when
    allow_inference (the FastTextKeyedVectors branch), dropped otherwise."""
    import numpy as np
    from gensim_spark.api import FastText

    texts = [["cat", "say", "meow"], ["dog", "say", "woof"]] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    m = FastText(df, vector_size=8, window=2, negative=2, epochs=1,
                 bucket=500, num_shards=2, seed=3)
    sub = m.vectors_for_all(["cat", "caat", "cat", "dog"])
    rows = {r["token"]: np.asarray(r["embedding"])
            for r in sub.df.collect()}
    assert set(rows) == {"cat", "caat", "dog"}
    np.testing.assert_allclose(rows["caat"], m.get_vector("caat"))
    np.testing.assert_allclose(rows["cat"], m.get_vector("cat"))
    dropped = m.vectors_for_all(["cat", "caat"], allow_inference=False)
    assert {r["token"] for r in dropped.df.collect()} == {"cat"}
