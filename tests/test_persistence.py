"""Index save/load round trip (the SaveLoad analogue)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import docs_df


def test_save_load_roundtrip(spark, common_texts, tmp_path):
    from gensim_spark.plans import pipeline as P
    from gensim_spark.plans.persistence import load_index, save_index

    df = docs_df(spark, common_texts)
    idx = P.build(df, num_docs=len(common_texts))
    path = str(tmp_path / "saved")
    meta = save_index(idx, path)
    assert meta["avgdl"] == pytest.approx(idx.stats.avgdl)

    loaded = load_index(spark, path)
    assert loaded.num_docs == idx.num_docs
    assert loaded.stats.avgdl == pytest.approx(idx.stats.avgdl)
    gv = {r["token"]: r["term_id"] for r in loaded.vocab.collect()}
    wv = {r["token"]: r["term_id"] for r in idx.vocab.collect()}
    assert gv == wv
    gw = {(r["doc_id"], r["term_id"]): r["weight"]
          for r in loaded.weighted.collect()}
    ww = {(r["doc_id"], r["term_id"]): r["weight"]
          for r in idx.weighted.collect()}
    assert set(gw) == set(ww)
    for k in ww:
        assert gw[k] == pytest.approx(ww[k], rel=1e-12)


def test_load_reweights_when_weights_not_saved(spark, common_texts, tmp_path):
    from gensim_spark.plans import pipeline as P
    from gensim_spark.plans.persistence import load_index, save_index

    df = docs_df(spark, common_texts)
    idx = P.build(df, num_docs=len(common_texts))
    path = str(tmp_path / "saved2")
    save_index(idx, path, include_weighted=False)
    loaded = load_index(spark, path)
    gw = {(r["doc_id"], r["term_id"]): r["weight"]
          for r in loaded.weighted.collect()}
    ww = {(r["doc_id"], r["term_id"]): r["weight"]
          for r in idx.weighted.collect()}
    for k in ww:
        assert gw[k] == pytest.approx(ww[k], rel=1e-12)


def test_load_preserves_postings_fit_avgdl(spark, common_texts, tmp_path):
    """An index fit with fit_from_postings (avgdl = nnz/num_docs, the
    reference quirk) must reload with the SAME avgdl — load_index rehydrates
    from the saved scalar instead of refitting from vocab (Σcf/num_docs)."""
    from gensim_spark.operators import bm25 as M
    from gensim_spark.plans import pipeline as P
    from gensim_spark.plans.persistence import load_index, save_index

    df = docs_df(spark, common_texts)
    idx = P.build(df, num_docs=len(common_texts))
    import dataclasses

    stats_p = M.fit_from_postings(idx.postings)
    assert stats_p.avgdl != pytest.approx(idx.stats.avgdl)  # quirk differs
    idx2 = dataclasses.replace(idx, stats=stats_p, weighted=None)
    path = str(tmp_path / "saved_postings_fit")
    save_index(idx2, path, include_weighted=False)
    loaded = load_index(spark, path)
    assert loaded.stats.avgdl == pytest.approx(stats_p.avgdl)


def test_query_after_reload(spark, common_texts, tmp_path):
    from gensim_spark.plans import pipeline as P
    from gensim_spark.plans.persistence import load_index, save_index
    from tests.oracle import PyBM25, PyDictionary, py_topk

    df = docs_df(spark, common_texts)
    idx = P.build(df, num_docs=len(common_texts))
    path = str(tmp_path / "saved3")
    save_index(idx, path)
    loaded = load_index(spark, path)
    res = P.query_text(spark, loaded, {0: "graph user"}, k=5)
    got = [(r["doc_id"], r["score"])
           for r in res.orderBy("rank").collect()]
    odict = PyDictionary(common_texts)
    model = PyBM25(dictionary=odict)
    corpus = [model.transform(odict.doc2bow(d)) for d in common_texts]
    want = py_topk(corpus, [odict.token2id["graph"], odict.token2id["user"]], 5)
    assert [d for d, _ in got] == [d for d, _ in want]
