"""Facet counts + range histograms over a match set (operators/facets.py)."""
import pytest

from gensim_spark.operators import facets as FC


@pytest.fixture(scope="module")
def meta(spark):
    rows = [(0, "en", "a", 10), (1, "en", "b", 25), (2, "de", "a", 35),
            (3, "fr", "b", 95), (4, "en", "a", 55), (5, "de", "c", 5)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")


def _matches(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_facet_counts(spark, meta):
    m = _matches(spark, [0, 1, 2, 4])
    got = [(r["value"], r["count"])
           for r in FC.facet_counts(meta, m, "lang").collect()]
    assert got == [("en", 3), ("de", 1)]
    # duplicate match rows (multi-query frame) count a doc once
    md = _matches(spark, [0, 0, 1, 1, 2])
    got2 = [(r["value"], r["count"])
            for r in FC.facet_counts(meta, md, "source").collect()]
    assert got2 == [("a", 2), ("b", 1)]
    # top clip + count-desc/value-asc tie order
    got3 = [(r["value"], r["count"])
            for r in FC.facet_counts(meta, _matches(spark, range(6)),
                                     "source", top=2).collect()]
    assert got3 == [("a", 3), ("b", 2)]


def test_facet_counts_null_field(spark):
    """Docs missing the facet field are skipped by default (Lucene
    FacetsCollector semantics; ADVICE r4); keep_nulls=True surfaces them
    as a NULL sidebar row."""
    rows = [(0, "a"), (1, None), (2, "a"), (3, None), (4, "b")]
    meta = spark.createDataFrame(rows, "doc_id long, source string")
    m = _matches(spark, range(5))
    got = [(r["value"], r["count"])
           for r in FC.facet_counts(meta, m, "source").collect()]
    assert got == [("a", 2), ("b", 1)]
    kept = [(r["value"], r["count"])
            for r in FC.facet_counts(meta, m, "source",
                                     keep_nulls=True).collect()]
    assert (None, 2) in kept and ("a", 2) in kept and ("b", 1) in kept


def test_facet_ranges(spark, meta):
    m = _matches(spark, range(6))
    got = [(r["bucket"], r["lo"], r["hi"], r["count"])
           for r in FC.facet_ranges(meta, m, "n_chars",
                                    lo=0.0, width=30.0,
                                    n_buckets=3).collect()]
    # 10,25,5 -> b0; 35,55 -> b1; 95 clamps into b2
    assert got == [(0, 0.0, 30.0, 3), (1, 30.0, 60.0, 2),
                   (2, 60.0, 90.0, 1)]
    # empty buckets emitted with 0
    got2 = [(r["bucket"], r["count"])
            for r in FC.facet_ranges(meta, _matches(spark, [0]), "n_chars",
                                     lo=0.0, width=20.0,
                                     n_buckets=4).collect()]
    assert got2 == [(0, 1), (1, 0), (2, 0), (3, 0)]
    with pytest.raises(ValueError):
        FC.facet_ranges(meta, m, "n_chars", 0.0, 0.0, 3)


def test_sort_topk_and_search_after(spark, meta):
    from gensim_spark.operators import topk as T

    scores = spark.createDataFrame(
        [(0, d, 1.0) for d in range(6)],
        "query_id int, doc_id long, score double")
    # n_chars: d0=10 d1=25 d2=35 d3=95 d4=55 d5=5
    out = [(r["doc_id"], r["n_chars"], r["rank"]) for r in
           T.sort_topk(scores, meta, "n_chars", k=3).orderBy("rank").collect()]
    assert out == [(3, 95, 1), (4, 55, 2), (2, 35, 3)]
    # searchAfter cursor = the last row of page 1 -> page 2 ranks 1..k
    page2 = [(r["doc_id"], r["n_chars"], r["rank"]) for r in
             T.sort_topk(scores, meta, "n_chars", k=3,
                         after=(35, 2)).orderBy("rank").collect()]
    assert page2 == [(1, 25, 1), (0, 10, 2), (5, 5, 3)]
    # ascending + tie on the field value: doc_id asc breaks it
    meta2 = meta.union(spark.createDataFrame([(6, "en", "a", 25)],
                                             meta.schema))
    scores2 = spark.createDataFrame(
        [(0, d, 1.0) for d in range(7)],
        "query_id int, doc_id long, score double")
    asc = [(r["doc_id"], r["rank"]) for r in
           T.sort_topk(scores2, meta2, "n_chars", k=4,
                       ascending=True).orderBy("rank").collect()]
    assert asc == [(5, 1), (0, 2), (1, 3), (6, 4)]
    # cursor at a tied value: only doc_id > cursor doc survives the tie
    after_tie = [(r["doc_id"], r["rank"]) for r in
                 T.sort_topk(scores2, meta2, "n_chars", k=2,
                             ascending=True,
                             after=(25, 1)).orderBy("rank").collect()]
    assert after_tie == [(6, 1), (2, 2)]
