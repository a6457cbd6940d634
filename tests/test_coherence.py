"""Coherence pipeline parity vs a sequential replica of the reference.

The replica below re-implements gensim's accumulators exactly as specified in
gensim/topic_coherence/text_analysis.py (CorpusAccumulator:256-270,
WordOccurrenceAccumulator:320-404 incl. the incremental `_slide_window`
edge-clearing quirk) so the distributed operators can be checked count-for-
count and score-for-score on random corpora. Docstring goldens from
direct_confirmation_measure.py and indirect_confirmation_measure.py pin the
measure formulas to the reference's published values.
"""
import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import coherence as C


# --- sequential replica of the reference accumulators -------------------------

def ref_boolean_doc(bow_docs, relevant_ids, vsize_map):
    """CorpusAccumulator.accumulate replica (text_analysis.py:256-270)."""
    V = len(vsize_map)
    inv = {i: set() for i in range(V)}
    n = 0
    for doc in bow_docs:
        words = frozenset(w for w, _ in doc)
        for w in set(relevant_ids) & words:
            inv[vsize_map[w]].add(n)
        n += 1
    occ = np.array([len(inv[i]) for i in range(V)], dtype=np.int64)
    co = np.zeros((V, V), dtype=np.int64)
    for i in range(V):
        for j in range(V):
            if i != j:
                co[i, j] = len(inv[i] & inv[j])
    np.fill_diagonal(co, occ)
    return occ, co, n


def ref_sliding_window(texts, relevant, window_size):
    """WordOccurrenceAccumulator.accumulate replica (text_analysis.py:320-404
    + utils.iter_windows with ignore_below_size=False)."""
    mp = {t: i for i, t in enumerate(relevant)}
    V = len(mp)
    occ = np.zeros(V, dtype=np.int64)
    counter = {}
    nwin = 0
    for text in texts:
        ids = np.array([mp.get(w, V) for w in text], dtype=np.int64)
        n = len(ids)
        if n == 0:
            nwin += 1
            continue
        windows = ([ids[k:k + window_size]
                    for k in range(n - window_size + 1)]
                   if n >= window_size else [ids])
        uniq = np.zeros(V + 1, dtype=bool)
        tok_edge = None
        for w in windows:
            if tok_edge is None:
                uniq[:] = False
                uniq[np.unique(w)] = True
            else:
                uniq[tok_edge] = False
                uniq[w[-1]] = True
            tok_edge = w[0]
            nwin += 1
            present = np.nonzero(uniq[:-1])[0]
            if present.size:
                occ[present] += 1
                for p in itertools.combinations(present.tolist(), 2):
                    counter[p] = counter.get(p, 0) + 1
    co = np.zeros((V, V), dtype=np.int64)
    for (i, j), c in counter.items():
        co[i, j] += c
    co = co + co.T
    np.fill_diagonal(co, occ)
    return occ, co, nwin


def rand_texts(rng, n_docs=40, vocab=12, max_len=30):
    words = [f"w{i}" for i in range(vocab)]
    return [[words[rng.integers(vocab)] for _ in range(rng.integers(0, max_len))]
            for _ in range(n_docs)]


# --- docstring goldens ---------------------------------------------------------

def test_log_conditional_golden():
    # direct_confirmation_measure.py:39-64: inverted index {0:{2,3,4},1:{3,5}},
    # num_docs=5, seg [(1,2)] -> ~ln(1/2)
    stats = C.CoherenceStats(
        {1: 0, 2: 1}, np.array([3, 2]),
        np.array([[3, 1], [1, 2]]), 5)
    got = C.log_conditional_probability([[(1, 2)]], stats)[0]
    assert got == pytest.approx(-0.693147181, abs=1e-8)


def test_log_ratio_golden():
    # direct_confirmation_measure.py:168-185: ~ln{(1/5)/[(3/5)*(2/5)]}
    stats = C.CoherenceStats(
        {1: 0, 2: 1}, np.array([3, 2]),
        np.array([[3, 1], [1, 2]]), 5)
    got = C.log_ratio_measure([[(1, 2)]], stats)[0]
    assert got == pytest.approx(-0.182321557, abs=1e-8)


def test_cosine_similarity_golden():
    # test_indirect_confirmation.py:34-50: inverted index {0:{2,3,4},1:{3,5}},
    # num_docs=5, s_one_set over topic [1,2] -> mean cosine ~0.6230
    stats = C.CoherenceStats(
        {1: 0, 2: 1}, np.array([3, 2]),
        np.array([[3, 1], [1, 2]]), 5)
    seg = [[(1, np.array([1, 2])), (2, np.array([1, 2]))]]
    got = C.cosine_similarity(seg, stats, [np.array([1, 2])])[0]
    assert got == pytest.approx(0.6230, abs=1e-4)


def test_segmentations_golden():
    # segmentation.py docstring examples
    topics = [np.array([1, 2, 3]), np.array([4, 5, 6])]
    assert C.s_one_pre(topics) == [[(2, 1), (3, 1), (3, 2)],
                                   [(5, 4), (6, 4), (6, 5)]]
    assert C.s_one_one(topics)[0] == [(1, 2), (1, 3), (2, 1), (2, 3),
                                      (3, 1), (3, 2)]
    s = C.s_one_set([np.array([9, 10, 7])])
    assert [(w, list(ws)) for w, ws in s[0]] == \
        [(9, [9, 10, 7]), (10, [9, 10, 7]), (7, [9, 10, 7])]


# --- distributed vs replica ----------------------------------------------------

def test_boolean_doc_stats_matches_replica(spark):
    rng = np.random.default_rng(7)
    texts = rand_texts(rng)
    vocab = sorted({w for t in texts for w in t})
    w2id = {w: i for i, w in enumerate(vocab)}
    bow = [[(w2id[w], c) for w, c in
            zip(*np.unique(t, return_counts=True))] if t else []
           for t in texts]
    rows = [(d, int(w), int(c)) for d, doc in enumerate(bow)
            for w, c in doc]
    postings = spark.createDataFrame(rows, "doc_id long, term_id long, tf long")

    relevant = [w2id[w] for w in vocab[:6]]
    vmap = {w: i for i, w in enumerate(relevant)}
    r_occ, r_co, r_n = ref_boolean_doc(bow, relevant, vmap)

    stats = C.boolean_doc_stats(postings, relevant, num_docs=len(texts))
    assert stats.num_docs == len(texts) == r_n
    np.testing.assert_array_equal(stats.occurrences, r_occ)
    np.testing.assert_array_equal(stats.co, r_co)


@pytest.mark.parametrize("window_size", [2, 3, 10, 1000])
def test_sliding_window_stats_matches_replica(spark, window_size):
    rng = np.random.default_rng(window_size)
    texts = rand_texts(rng, n_docs=30, vocab=8, max_len=25)
    relevant = [f"w{i}" for i in range(5)]
    r_occ, r_co, r_nwin = ref_sliding_window(texts, relevant, window_size)

    df = spark.createDataFrame([(t,) for t in texts],
                               "tokens array<string>").repartition(4)
    stats = C.sliding_window_stats(df, relevant, window_size)
    assert stats.num_docs == r_nwin
    np.testing.assert_array_equal(stats.occurrences, r_occ)
    np.testing.assert_array_equal(stats.co, r_co)


def test_sliding_window_edge_clearing_quirk(spark):
    # doc [a,b,a,c] window 3: w1={a,b}; sliding clears 'a' at the edge even
    # though 'a' is still inside -> w2={b,c}, NOT {a,b,c}
    df = spark.createDataFrame([(["a", "b", "a", "c"],)],
                               "tokens array<string>")
    stats = C.sliding_window_stats(df, ["a", "b", "c"], 3)
    assert stats.num_docs == 2
    # a counted once (w1 only), b twice, c once
    np.testing.assert_array_equal(stats.occurrences, [1, 2, 1])
    assert stats.co[0, 1] == 1 and stats.co[1, 2] == 1 and stats.co[0, 2] == 0


def test_end_to_end_measures_match_replica(spark):
    rng = np.random.default_rng(99)
    texts = rand_texts(rng, n_docs=50, vocab=10, max_len=40)
    df = spark.createDataFrame([(t,) for t in texts],
                               "tokens array<string>").repartition(3)
    topics = [["w0", "w1", "w2"], ["w3", "w4", "w5"]]

    for measure, seg_fn, norm in (("c_uci", C.s_one_one, False),
                                  ("c_npmi", C.s_one_one, True)):
        relevant = [w for t in topics for w in t]
        r_occ, r_co, r_nwin = ref_sliding_window(texts, relevant, 10)
        stats = C.CoherenceStats({t: i for i, t in enumerate(relevant)},
                                 r_occ, r_co, r_nwin)
        want = C.log_ratio_measure(seg_fn(topics), stats, normalize=norm)
        got = C.coherence_per_topic(topics, measure, texts=df)
        assert got == pytest.approx(want, rel=1e-12)

    # c_v end to end
    relevant = [w for t in topics for w in t]
    r_occ, r_co, r_nwin = ref_sliding_window(texts, relevant, 110)
    stats = C.CoherenceStats({t: i for i, t in enumerate(relevant)},
                             r_occ, r_co, r_nwin)
    want = C.cosine_similarity(C.s_one_set(topics), stats, topics)
    got = C.coherence_per_topic(topics, "c_v", texts=df)
    assert got == pytest.approx(want, rel=1e-12)
    assert all(math.isfinite(x) for x in got)


def test_probability_estimation_reference_goldens(spark):
    # gensim/test/test_probability_estimation.py:20-86 fixtures
    texts = [
        ["human", "interface", "computer"],
        ["eps", "user", "interface", "system"],
        ["system", "human", "system", "eps"],
        ["user", "response", "time"],
        ["trees"],
        ["graph", "trees"],
    ]
    vocab = sorted({w for t in texts for w in t})
    w2id = {w: i for i, w in enumerate(vocab)}
    relevant = [w2id["computer"], w2id["system"], w2id["user"],
                w2id["graph"]]

    rows = [(d, w2id[w], 1) for d, t in enumerate(texts) for w in set(t)]
    postings = spark.createDataFrame(rows,
                                     "doc_id long, term_id long, tf long")
    stats = C.boolean_doc_stats(postings, relevant, num_docs=len(texts))
    # expected inverted index: computer {0}, system {1,2}, user {1,3},
    # graph {5} (test_probability_estimation.py:69-74)
    assert stats.count(w2id["computer"]) == 1
    assert stats.count(w2id["system"]) == 2
    assert stats.count(w2id["user"]) == 2
    assert stats.count(w2id["graph"]) == 1
    assert stats.co_count(w2id["user"], w2id["system"]) == 1  # doc 1
    assert stats.num_docs == 6

    # sliding window size 2 (test_probability_estimation.py:77-85)
    df = spark.createDataFrame([(t,) for t in texts],
                               "tokens array<string>")
    wstats = C.sliding_window_stats(
        df, ["computer", "system", "user", "graph"], 2)
    assert wstats.count("computer") == 1
    assert wstats.count("user") == 3
    assert wstats.count("graph") == 1
    assert wstats.count("system") == 4
    assert wstats.num_docs == 12  # Σ windows over the six docs


def test_u_mass_end_to_end(spark):
    rng = np.random.default_rng(5)
    texts = rand_texts(rng, n_docs=60, vocab=9, max_len=35)
    vocab = sorted({w for t in texts for w in t})
    w2id = {w: i for i, w in enumerate(vocab)}
    bow = [[(w2id[w], int(c)) for w, c in
            zip(*np.unique(t, return_counts=True))] if t else []
           for t in texts]
    rows = [(d, int(w), int(c)) for d, doc in enumerate(bow) for w, c in doc]
    postings = spark.createDataFrame(rows,
                                     "doc_id long, term_id long, tf long")
    topics = [[w2id["w0"], w2id["w1"], w2id["w2"]],
              [w2id["w3"], w2id["w4"], w2id["w5"]]]
    relevant = [w for t in topics for w in t]
    vmap = {w: i for i, w in enumerate(relevant)}
    r_occ, r_co, r_n = ref_boolean_doc(bow, relevant, vmap)
    stats = C.CoherenceStats(vmap, r_occ, r_co, r_n)
    want = C.log_conditional_probability(C.s_one_pre(topics), stats)
    got = C.coherence_per_topic(topics, "u_mass", postings=postings,
                                num_docs=len(texts))
    assert got == pytest.approx(want, rel=1e-12)
    mean = C.get_coherence(topics, "u_mass", postings=postings,
                           num_docs=len(texts))
    assert mean == pytest.approx(float(np.mean(want)), rel=1e-12)


def test_c_w2v_n_similarity(spark):
    rng = np.random.default_rng(3)
    vecs = {f"w{i}": rng.normal(size=8) for i in range(6)}
    topics = [["w0", "w1", "w2"], ["w3", "w4", "oov"]]
    got = C.coherence_per_topic(topics, "c_w2v", keyed_vectors=vecs)

    # replica of KeyedVectors.n_similarity over s_one_set
    def nsim(ws1, ws2):
        m1 = np.mean([vecs[w] for w in ws1 if w in vecs], axis=0)
        m2 = np.mean([vecs[w] for w in ws2 if w in vecs], axis=0)
        return float(m1 @ m2 / (np.linalg.norm(m1) * np.linalg.norm(m2)))

    for k, topic in enumerate(topics):
        sims = [nsim([w], [x for x in topic if x in vecs])
                for w in topic if w in vecs]
        assert got[k] == pytest.approx(float(np.mean(sims)), rel=1e-12)


def test_coherence_with_lda_facade(spark):
    from gensim_spark.api import CoherenceModel, Dictionary, LdaModel
    from gensim_spark.functions import textprep
    from gensim_spark.operators import bow as B

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = textprep.tokenize_pages(docs, text_col="text") \
        .select("doc_id", "tokens")
    d = Dictionary(tok)
    postings = B.doc2bow_postings(tok, d.df).select("doc_id", "term_id", "tf")
    lda = LdaModel(postings, id2word=d, num_topics=3, passes=1, iterations=15)

    cm = CoherenceModel(model=lda, corpus=postings, dictionary=d,
                        coherence="u_mass")
    per_topic = cm.get_coherence_per_topic()
    assert len(per_topic) == 3 and all(math.isfinite(x) for x in per_topic)
    assert cm.get_coherence() == pytest.approx(float(np.mean(per_topic)))

    cm2 = CoherenceModel(model=lda, texts=tok, dictionary=d,
                         coherence="c_npmi", window_size=10, topn=5)
    pt2 = cm2.get_coherence_per_topic()
    assert len(pt2) == 3 and all(math.isfinite(x) for x in pt2)


def test_log_ratio_zero_count_yields_inf():
    # ADVICE r4: a topic word with zero occurrences in the eval texts must
    # yield +/-inf (the reference's numpy-uint32 counts divide to inf with a
    # RuntimeWarning, direct_confirmation_measure.py:205-207), never raise
    # ZeroDivisionError.
    stats = C.CoherenceStats(
        {1: 0, 2: 1}, np.array([3, 0]),
        np.array([[3, 0], [0, 0]]), 5)
    pmi = C.log_ratio_measure([[(1, 2)]], stats)[0]
    assert np.isinf(pmi) and pmi > 0
    npmi = C.log_ratio_measure([[(1, 2)]], stats, normalize=True)[0]
    assert np.isinf(npmi) and npmi > 0
    # c_v path flows through _pair_npmi -> must not crash either
    seg = [[(1, np.array([1, 2])), (2, np.array([1, 2]))]]
    got = C.cosine_similarity(seg, stats, [np.array([1, 2])])
    assert len(got) == 1
