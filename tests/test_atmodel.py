"""Author-Topic model: distributed shard-sync EM vs a sequential replica
(num_shards=1 = the reference's exact batch flow: one sequential γ pass in
doc order), planted-authorship recovery, partitioning invariance."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import atmodel as AT


def replica_fit(doc_list, pairs, num_topics, num_terms, num_authors,
                num_shards=4, passes=2, iterations=20, random_seed=13):
    """Driver-only replica of author_topic_fit: same shard split, same
    sequential within-shard γ coupling, same count-weighted γ fold and
    LDA M-step."""
    model = AT.AuthorTopicModel(num_topics, num_terms, num_authors,
                                iterations=iterations,
                                random_seed=random_seed)
    d2a = {}
    for d, a in pairs:
        d2a.setdefault(d, []).append(a)
    for d in d2a:
        d2a[d] = sorted(d2a[d])
    for _, a in pairs:
        model.author_doc_counts[a] += 1
    n_docs = len(doc_list)
    model.lda.numdocs = n_docs
    k, v = num_topics, num_terms
    for pass_ in range(passes):
        rhot = model.lda.rho(pass_)
        num, den = {}, {}
        sstats = np.zeros((k, v))
        for s in range(num_shards):
            gamma = model.gamma.copy()
            touched = np.zeros(num_authors, dtype=np.int64)
            for doc_id, ids, cts in sorted(d for d in doc_list
                                           if d[0] % num_shards == s):
                aus = np.asarray(d2a[doc_id], dtype=np.int64)
                tilde, contrib = AT.infer_doc_at(
                    np.asarray(ids, dtype=np.int64),
                    np.asarray(cts, dtype=np.float64),
                    gamma[aus],
                    model.author_doc_counts[aus].astype(np.float64),
                    model.lda.exp_elogbeta, model.lda.alpha, rhot,
                    iterations, model.lda.gamma_threshold)
                gamma[aus] = tilde
                touched[aus] += 1
                sstats[:, np.asarray(ids, dtype=np.int64)] += contrib
            for a in np.nonzero(touched)[0]:
                d = (gamma[a] - model.gamma[a]) * touched[a]
                if a in num:
                    num[a] += d
                    den[a] += touched[a]
                else:
                    num[a] = d
                    den[a] = touched[a]
        for a, d in num.items():
            model.gamma[a] += d / den[a]
        sstats *= model.lda.exp_elogbeta
        model.lda.do_mstep(rhot, sstats, n_docs, extra_pass=pass_ > 0)
    return model


def planted(rng, n_docs=40, vocab=12, n_authors=4):
    """Authors 0,1 co-write topic-A docs (terms 0..5); authors 2,3 topic-B
    (terms 6..11). Every doc has two authors — exercising the coupling."""
    docs, pairs = [], []
    for d in range(n_docs):
        grp = d % 2
        base = 0 if grp == 0 else vocab // 2
        ids = sorted({int(base + rng.integers(vocab // 2))
                      for _ in range(5)})
        cts = [float(rng.integers(1, 4)) for _ in ids]
        docs.append((d, ids, cts))
        pairs.append((d, 2 * grp))
        pairs.append((d, 2 * grp + 1))
    return docs, pairs


def _spark_inputs(spark, docs, pairs):
    postings = spark.createDataFrame(
        [(d, int(t), c) for d, ids, cts in docs
         for t, c in zip(ids, cts)],
        "doc_id long, term_id long, tf double")
    d2a = spark.createDataFrame(pairs, "doc_id long, author_id long")
    return postings, d2a


@pytest.mark.parametrize("num_shards", [1, 4])
def test_distributed_matches_replica(spark, num_shards):
    # num_shards=1 IS the reference batch flow (one sequential gamma pass)
    rng = np.random.default_rng(3)
    docs, pairs = planted(rng)
    postings, d2a = _spark_inputs(spark, docs, pairs)
    want = replica_fit(docs, pairs, 2, 12, 4, num_shards=num_shards)
    got = AT.author_topic_fit(postings.repartition(5), d2a, num_topics=2,
                              num_terms=12, num_authors=4,
                              num_shards=num_shards, passes=2,
                              iterations=20, random_seed=13)
    np.testing.assert_allclose(got.gamma, want.gamma, atol=0)
    np.testing.assert_allclose(got.lda.sstats, want.lda.sstats, atol=0)


def test_planted_authorship_recovered(spark):
    rng = np.random.default_rng(5)
    docs, pairs = planted(rng, n_docs=80)
    postings, d2a = _spark_inputs(spark, docs, pairs)
    m = AT.author_topic_fit(postings, d2a, num_topics=2, num_terms=12,
                            num_authors=4, num_shards=8, passes=6,
                            iterations=30, random_seed=13)
    dist = m.gamma / m.gamma.sum(axis=1, keepdims=True)
    top = dist.argmax(axis=1)
    assert top[0] == top[1] and top[2] == top[3] and top[0] != top[2]
    assert dist[0, top[0]] > 0.7 and dist[2, top[2]] > 0.7
    # topics themselves split the vocabulary
    topics = m.get_topics()
    ta, tb = topics[top[0]], topics[top[2]]
    assert ta[:6].sum() > 0.8 and tb[6:].sum() > 0.8


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(7)
    docs, pairs = planted(rng)
    postings, d2a = _spark_inputs(spark, docs, pairs)
    kw = dict(num_topics=2, num_terms=12, num_authors=4, num_shards=4,
              passes=2, iterations=15, random_seed=13)
    m1 = AT.author_topic_fit(postings, d2a, **kw)
    m2 = AT.author_topic_fit(postings.repartition(11),
                             d2a.repartition(3), **kw)
    np.testing.assert_allclose(m1.gamma, m2.gamma, atol=0)
    np.testing.assert_allclose(m1.lda.sstats, m2.lda.sstats, atol=0)


def test_get_author_topics_threshold(spark):
    rng = np.random.default_rng(9)
    docs, pairs = planted(rng, n_docs=60)
    postings, d2a = _spark_inputs(spark, docs, pairs)
    m = AT.author_topic_fit(postings, d2a, num_topics=2, num_terms=12,
                            num_authors=4, num_shards=4, passes=4,
                            iterations=30, random_seed=13)
    full = m.get_author_topics(0, minimum_probability=0.0)
    assert sum(p for _, p in full) == pytest.approx(1.0)
    capped = m.get_author_topics(0, minimum_probability=0.4)
    assert all(p > 0.4 for _, p in capped) and len(capped) < len(full)
    df = m.author_topics_df(postings.sparkSession,
                            minimum_probability=1e-8)
    got = df.groupBy("author_id").agg(
        F.round(F.sum("probability"), 9).alias("s")).collect()
    assert all(r["s"] == pytest.approx(1.0) for r in got)


def test_orphan_doc_raises(spark):
    """A corpus doc with no doc2author row must fail loudly (the reference
    KeyErrors on doc2author[doc_no]) instead of silently dropping the doc
    while author_doc_counts keeps its weight."""
    import pytest as _pytest

    from gensim_spark.operators.atmodel import author_topic_fit

    postings = spark.createDataFrame(
        [(0, 0, 2.0), (1, 1, 1.0)], "doc_id long, term_id long, tf double")
    d2a = spark.createDataFrame([(0, 0)], "doc_id long, author_id long")
    with _pytest.raises(ValueError, match="no doc2author"):
        author_topic_fit(postings, d2a, num_topics=2, passes=1)


def test_empty_corpus_raises(spark):
    import pytest as _pytest

    from gensim_spark.operators.atmodel import author_topic_fit

    empty = spark.createDataFrame([], "doc_id long, term_id long, tf double")
    d2a = spark.createDataFrame([(0, 0)], "doc_id long, author_id long")
    with _pytest.raises(ValueError, match="empty"):
        author_topic_fit(empty, d2a, num_topics=2, passes=1)
