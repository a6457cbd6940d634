"""M3: end-to-end BM25 top-k vs oracle — the correctness kernel (SURVEY.md §7.1 M3)."""

import pytest

from tests.conftest import docs_df
from tests.oracle import PyBM25, PyDictionary, py_topk


@pytest.fixture(scope="module")
def engine(spark, common_texts):
    from gensim_spark.operators import bm25 as M
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df).cache()
    postings = B.doc2bow_postings(df, vocab)
    odict = PyDictionary(common_texts)
    stats = M.fit_from_vocab(vocab, odict.num_docs)
    weighted = M.weight_postings(postings, stats).cache()
    model = PyBM25(dictionary=odict)
    oracle_corpus = [model.transform(odict.doc2bow(d)) for d in common_texts]
    return vocab, weighted, odict, oracle_corpus


def run_query(spark, engine, term_ids, k):
    from gensim_spark.operators import topk as T

    _, weighted, _, _ = engine
    q = T.query_terms_df(spark, {0: term_ids})
    rows = T.search(weighted, q, k=k).orderBy("rank").collect()
    return [(r["doc_id"], r["score"]) for r in rows]


@pytest.mark.parametrize("k", [1, 3, 10, 1000])
def test_topk_rank_and_score_identity(spark, engine, common_texts, k):
    _, _, odict, oracle_corpus = engine
    q = [odict.token2id["graph"], odict.token2id["user"]]
    got = run_query(spark, engine, q, k)
    want = py_topk(oracle_corpus, q, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_single_term_query(spark, engine, odict_key="trees"):
    _, _, odict, oracle_corpus = engine
    q = [odict.token2id[odict_key]]
    got = run_query(spark, engine, q, 10)
    want = py_topk(oracle_corpus, q, 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_unknown_term_scores_nothing(spark, engine):
    got = run_query(spark, engine, [99999], 10)
    assert got == []


def test_empty_query(spark, engine):
    from gensim_spark.operators import topk as T

    _, weighted, _, _ = engine
    q = spark.createDataFrame([], "query_id int, term_id long, q_weight double")
    assert T.search(weighted, q, k=5).count() == 0


def test_batch_queries_match_single(spark, engine):
    """Batch-vs-single equivalence (test_similarities.py batch sweep)."""
    from gensim_spark.operators import topk as T

    _, weighted, odict, oracle_corpus = engine
    queries = {
        0: [odict.token2id["graph"]],
        1: [odict.token2id["user"], odict.token2id["system"]],
        2: [odict.token2id["human"], odict.token2id["trees"], 12345],
    }
    q = T.query_terms_df(spark, queries)
    rows = T.search(weighted, q, k=4).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, terms in queries.items():
        want = py_topk(oracle_corpus, terms, 4)
        got = sorted(by_q.get(qid, []))
        assert [(d) for _, d, _ in got] == [d for d, _ in want]
        for (_, _, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_tie_break_by_doc_id(spark, bm25_docs):
    """doc1 and doc2 are identical ('cat lion') → equal scores; gensim's
    argsort tie order = ascending doc position (SURVEY.md §7.0 item 5)."""
    from gensim_spark.operators import bm25 as M
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import topk as T
    from gensim_spark.operators import vocab as V

    df = docs_df(spark, bm25_docs)
    vocab = V.build_vocab(df)
    odict = PyDictionary(bm25_docs)
    stats = M.fit_from_vocab(vocab, odict.num_docs)
    weighted = M.weight_postings(B.doc2bow_postings(df, vocab), stats)
    q = T.query_terms_df(spark, {0: [odict.token2id["lion"]]})
    rows = T.search(weighted, q, k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["score"] == pytest.approx(rows[1]["score"])


def test_similarity_by_id_num_best_none(spark):
    """k=None (the facades' num_best=None full-results mode) returns every
    nonzero similarity instead of crashing on None + int."""
    from gensim_spark.operators.topk import similarity_by_id

    rows = [(d, t, 1.0) for d in range(4) for t in (0, 1)]
    w = spark.createDataFrame(rows, "doc_id long, term_id long, weight double")
    got = similarity_by_id(w, 0, k=None).collect()
    assert len(got) == 4
    got_ex = similarity_by_id(w, 0, k=None, exclude_self=True).collect()
    assert len(got_ex) == 3 and all(r["doc_id"] != 0 for r in got_ex)
