"""Corpus wrappers (ClippedCorpus / SlicedCorpus / RepeatCorpus[NTimes],
reference gensim/utils.py:994-1134) as DataFrame plans — goldens from the
reference docstrings plus positional-slice parity with python slicing."""

from pyspark.sql import Row

from gensim_spark.operators import corpusops as C


def _bow_df(spark, corpus):
    """corpus: list of list[(term_id, weight)] → (doc_id, term_id, weight)
    postings rows; empty docs carry a null term marker row so the document
    itself survives (the engine's doclen table does the same)."""
    rows = []
    for d, doc in enumerate(corpus):
        if not doc:
            rows.append(Row(doc_id=d, term_id=None, weight=None))
        for t, w in doc:
            rows.append(Row(doc_id=d, term_id=t, weight=float(w)))
    return spark.createDataFrame(
        rows, "doc_id long, term_id int, weight double")


def _emitted(df, rep=False):
    """Reconstruct the reference's emission order: list of docs, each a
    sorted list of (term_id, weight)."""
    key = ["rep", "doc_id"] if rep else ["doc_id"]
    rows = df.orderBy(*key, "term_id").collect()
    docs, cur, curkey = [], None, None
    for r in rows:
        k = tuple(r[c] for c in key)
        if k != curkey:
            if cur is not None:
                docs.append(cur)
            cur, curkey = [], k
        if r["term_id"] is not None:
            cur.append((r["term_id"], r["weight"]))
    if cur is not None:
        docs.append(cur)
    return docs


def test_clipped_corpus(spark):
    corpus = [[(i, 1.0)] for i in range(10)]
    df = _bow_df(spark, corpus)
    out = C.clipped_corpus(df, 3)
    assert _emitted(out) == corpus[:3]
    # None = identity (reference: max_docs=None keeps everything)
    assert C.clipped_corpus(df, None) is df
    # clip beyond the corpus is a no-op on content
    assert _emitted(C.clipped_corpus(df, 99)) == corpus


def test_sliced_corpus(spark):
    corpus = [[(i, 1.0)] for i in range(10)]
    df = _bow_df(spark, corpus)
    for sl in (slice(1, 5), slice(0, 10, 3), slice(2, None, 2),
               slice(None, 4, None)):
        assert _emitted(C.sliced_corpus(df, sl)) == corpus[sl], sl
    # fancy indexing by positions
    got = _emitted(C.sliced_corpus(df, [7, 2, 4]))
    assert got == [corpus[2], corpus[4], corpus[7]]


def test_repeat_corpus_n_times_reference_golden(spark):
    # reference utils.py:1038: [[(1, 0.5)], []] * 3
    corpus = [[(1, 0.5)], []]
    df = _bow_df(spark, corpus)
    out = C.repeat_corpus_n_times(df, 3)
    assert _emitted(out, rep=True) == [[(1, 0.5)], []] * 3


def test_repeat_corpus_reference_golden(spark):
    # reference utils.py:1006: islice(cycle([[(1, 2)], []]), 5)
    corpus = [[(1, 2.0)], []]
    df = _bow_df(spark, corpus)
    out = C.repeat_corpus(df, 5)
    assert _emitted(out, rep=True) == [[(1, 2.0)], [], [(1, 2.0)], [],
                                       [(1, 2.0)]]
    # exact multiple → no partial cycle branch
    assert _emitted(C.repeat_corpus(df, 4), rep=True) == corpus * 2
    # reps < one cycle
    assert _emitted(C.repeat_corpus(df, 1), rep=True) == [[(1, 2.0)]]
    # degenerate
    assert C.repeat_corpus(df, 0).count() == 0


def test_repeat_corpus_multi_posting_docs(spark):
    # docs with SEVERAL postings each: corpus length must be the distinct
    # doc count, not the row count (regression: df.count() gave row count)
    corpus = [[(0, 1.0), (1, 2.0), (2, 3.0)], [(1, 1.0), (4, 1.0)],
              [(5, 2.0)]]
    df = _bow_df(spark, corpus)
    assert _emitted(C.repeat_corpus(df, 7), rep=True) == \
        corpus * 2 + [corpus[0]]
    assert _emitted(C.repeat_corpus(df, 2), rep=True) == corpus[:2]
