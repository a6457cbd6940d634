"""BoW converters (matutils family) round trips + clipped top-n."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import docs_df
from tests.oracle import PyDictionary


@pytest.fixture(scope="module")
def postings(spark, common_texts):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    return B.doc2bow_postings(df, vocab).select(
        "doc_id", "term_id", F.col("tf").cast("double").alias("weight")
    ).cache()


def test_bow_roundtrip(spark, postings):
    from gensim_spark.operators import matutils as MU

    bow = MU.postings_to_bow(postings)
    back = MU.bow_to_postings(bow)
    a = {(r["doc_id"], r["term_id"]): r["weight"] for r in postings.collect()}
    b = {(r["doc_id"], r["term_id"]): r["weight"] for r in back.collect()}
    assert a == b
    # bow entries sorted by term id
    for r in bow.collect():
        ids = [e["term_id"] for e in r["bow"]]
        assert ids == sorted(ids)


def test_sparse_dense_roundtrip(spark, postings, common_texts):
    from gensim_spark.operators import matutils as MU

    odict = PyDictionary(common_texts)
    n = len(odict.token2id)
    dense = MU.sparse2full(postings, n)
    rows = {r["doc_id"]: r["vec"] for r in dense.collect()}
    assert all(len(v) == n for v in rows.values())
    for i, doc in enumerate(common_texts):
        want = [0.0] * n
        for t, f in odict.doc2bow(doc):
            want[t] = float(f)
        assert rows[i] == want
    back = MU.full2sparse(dense)
    a = {(r["doc_id"], r["term_id"]): r["weight"] for r in postings.collect()}
    b = {(r["doc_id"], r["term_id"]): r["weight"] for r in back.collect()}
    assert a == b


def test_full2sparse_clipped(spark, common_texts):
    from gensim_spark.operators import matutils as MU

    dense = spark.createDataFrame(
        [(0, [0.5, -2.0, 0.0, 2.0, 1.0])], "doc_id long, vec array<double>"
    )
    out = sorted(
        (r["term_id"], r["weight"])
        for r in MU.full2sparse_clipped(dense, topn=2).collect()
    )
    # top-2 by |w|: ids 1 (-2.0) and 3 (2.0); tie broken by position asc
    assert out == [(1, -2.0), (3, 2.0)]
