"""SearchEngine facade (api.py): every query type delegates identically to
its operator; OOV semantics; lazy positional build."""
import pytest
from pyspark.sql import functions as F

from gensim_spark.api import SearchEngine


@pytest.fixture(scope="module")
def engine(spark):
    rows = [
        (0, "alpha beta gamma alpha", "en", "siteA"),
        (1, "beta gamma delta", "en", "siteA"),
        (2, "alpha delta delta", "de", "siteB"),
        (3, "gamma gamma beta alpha", "en", "siteB"),
        (4, "epsilon zeta", "fr", "siteC"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    return SearchEngine(docs, variant="lucene"), docs


def _rows(df):
    return [(r["doc_id"], r["rank"], pytest.approx(r["score"], rel=1e-12))
            for r in df.orderBy("rank").collect()]


def test_search_matches_operator_path(spark, engine):
    from gensim_spark.operators import topk as T

    se, docs = engine
    got = se.search("alpha beta", k=10)
    tid = {r["token"]: r["term_id"] for r in se.index.vocab.collect()}
    q = T.query_terms_df(spark, {0: [tid["alpha"], tid["beta"]]})
    want = T.search(se.index.weighted, q, 10)
    assert _rows(got) == _rows(want)
    # all-OOV query answers an empty, correctly-schema'd frame
    assert se.search("nosuch words", k=5).count() == 0


def test_search_collapse_and_highlight(engine):
    se, docs = engine
    out = {r["doc_id"]: r for r in
           se.search("alpha beta", k=10, collapse="source",
                     highlight=3).collect()}
    # one winner per source among matching docs (siteC has no match)
    assert len(out) == 2
    assert {r["source"] for r in out.values()} == {"siteA", "siteB"}
    for r in out.values():
        assert "<b>" in r["snippet"]


def test_boolean_and_oov_must(engine):
    se, _ = engine
    got = {r["doc_id"] for r in
           se.boolean(must=["alpha"], must_not=["delta"], k=10).collect()}
    assert got == {0, 3}
    assert se.boolean(must=["nosuch"], should=["alpha"], k=5).count() == 0
    # OOV should-terms just drop
    got2 = {r["doc_id"] for r in
            se.boolean(should=["alpha", "nosuch"], k=10).collect()}
    assert got2 == {0, 2, 3}


def test_rewrites_and_phrase(engine):
    se, _ = engine
    assert {r["doc_id"] for r in se.prefix("alp", k=10).collect()} \
        == {0, 2, 3}
    assert {r["doc_id"] for r in se.wildcard("?eta", k=10).collect()} \
        == {0, 1, 3, 4}  # beta|zeta
    fz = {r["doc_id"] for r in se.fuzzy("beta", 1, k=10).collect()}
    assert fz == {0, 1, 3, 4}  # beta, zeta
    ph = se.phrase("alpha beta", k=10).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in ph] == [(0, 1)]
    nr = se.phrase("alpha delta", slop=1, k=10).collect()
    assert [(r["doc_id"], r["near_tf"]) for r in nr] == [(2, 1)]
    # 3-clause sloppy phrase routes through span_near_topk: doc 0 =
    # [alpha beta gamma alpha] — chain a@0 → g@2 → a@3, stretch 1
    sn = se.phrase("alpha gamma alpha", slop=1, k=10).collect()
    assert [(r["doc_id"], r["near_tf"]) for r in sn] == [(0, 1)]
    assert se.phrase("alpha gamma alpha", slop=0, k=10).count() == 0
    assert se.phrase("alpha nosuch", k=5).count() == 0
    # MultiPhrase "alpha (beta|delta)": d0 alpha@0-beta@1, d2
    # alpha@0-delta@1; slop routes through the OR-clause SpanNear
    mp = se.multi_phrase([["alpha"], ["beta", "delta"]], k=10).collect()
    assert {(r["doc_id"], r["phrase_tf"]) for r in mp} == {(0, 1), (2, 1)}
    # d0: gamma@2→alpha@3 (stretch 1); d3 = [gamma gamma beta alpha]:
    # gamma@0→beta@2 (stretch 2) AND gamma@1→beta@2 (stretch 1) → tf 2
    mp2 = se.multi_phrase([["gamma"], ["alpha", "beta"]], k=10,
                          slop=1).collect()
    assert {(r["doc_id"], r["phrase_tf"]) for r in mp2} == {(0, 1), (3, 2)}
    # OOV alternatives drop; an all-OOV position answers empty
    mp3 = se.multi_phrase([["alpha"], ["beta", "nosuch"]], k=10).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in mp3] == \
        [(r["doc_id"], r["phrase_tf"]) for r in
         se.multi_phrase([["alpha"], ["beta"]], k=10).collect()]
    assert se.multi_phrase([["alpha"], ["nosuch"]], k=10).count() == 0
    # SpanNot: alpha with no beta within +-1 — d0 alpha@0 blocked by
    # beta@1 but alpha@3 clean; d2 alpha@0 clean; d3 alpha@3 blocked
    nt = se.span_not("alpha", "beta", pre=1, post=1, k=10).collect()
    assert {(r["doc_id"], r["near_tf"]) for r in nt} == {(0, 1), (2, 1)}
    # ordered include span [alpha delta] with no gamma around: only d2
    nt2 = se.span_not(["alpha", "delta"], "gamma", k=10).collect()
    assert [(r["doc_id"], r["near_tf"]) for r in nt2] == [(2, 1)]
    # OOV exclude can never block -> plain span counts
    nt3 = se.span_not(["alpha", "delta"], "nosuch", k=10).collect()
    assert [(r["doc_id"], r["near_tf"]) for r in nt3] == \
        [(r["doc_id"], r["near_tf"]) for r in nt2]
    # STRINGS tokenize (review r5b): a multi-word include string equals
    # the word-list form, a multi-word exclude string is its word SET
    nt4 = se.span_not("alpha delta", "gamma", k=10).collect()
    assert [(r["doc_id"], r["near_tf"]) for r in nt4] == \
        [(r["doc_id"], r["near_tf"]) for r in nt2]
    # exclude "beta gamma": d2 alpha@0 has neither nearby; d0/d3 alphas
    # all have a beta or gamma within +-1
    nt5 = se.span_not("alpha", "beta gamma", pre=1, post=1, k=10).collect()
    assert [(r["doc_id"], r["near_tf"]) for r in nt5] == [(2, 1)]


def test_bm25f_multi_field(spark):
    """search(fields=) — BM25F-lite: each field scored against its own
    sub-index (field-specific df/avgdl), boosted scores sum before the
    rank window; recomposed per-field scores pin the fusion exactly."""
    from gensim_spark.operators import topk as T

    rows = [
        (0, "spark engine", "spark runs fast on big clusters"),
        (1, "cluster guide", "the spark engine shuffles wide data"),
        (2, "cooking book", "engine oil is not food at all"),
        (3, "misc notes", "nothing relevant in here today"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, title string, body string")
    se = SearchEngine(docs, text_col="body", variant="lucene")
    out = se.search("spark engine", k=10,
                    fields={"title": 2.0, "body": 1.0})
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out.collect()}
    assert set(got) == {0, 1, 2}  # doc 3 matches neither field

    # recompose: fused == 2·title_score + body_score, per-field indexes
    def field_scores(col):
        idx = se._field_index(col)
        tid = {r["token"]: r["term_id"] for r in idx.vocab.filter(
            F.col("token").isin(["spark", "engine"])).collect()}
        q = T.query_terms_df(spark, {0: sorted(tid.values())})
        return {r["doc_id"]: r["score"]
                for r in T.score(idx.weighted, q).collect()}

    ts, bs = field_scores("title"), field_scores("body")
    for d, (s, _) in got.items():
        assert s == pytest.approx(2.0 * ts.get(d, 0.0) + bs.get(d, 0.0),
                                  rel=1e-12)
    # title boost dominates: doc 0 ("spark engine" title) outranks doc 1
    assert got[0][1] < got[1][1]
    # per-field statistics really differ from the main index (df over
    # titles, not bodies)
    tdf = {r["token"]: r["df"] for r in
           se._field_index("title").vocab.collect()}
    bdf = {r["token"]: r["df"] for r in se.index.vocab.collect()}
    assert tdf["spark"] == 1 and bdf["spark"] == 2
    # OOV-in-one-field: query matching only bodies still answers
    only_body = se.search("shuffles", k=10,
                          fields={"title": 2.0, "body": 1.0})
    assert [r["doc_id"] for r in only_body.collect()] == [1]
    # all-OOV answers the empty frame; unknown field raises
    assert se.search("nosuch", k=5,
                     fields={"title": 2.0, "body": 1.0}).count() == 0
    with pytest.raises(ValueError):
        se.search("spark", fields={"headline": 1.0})
    # collapse composes on the fused scores
    docs2 = docs.withColumn("site", (F.col("doc_id") % 2).cast("string"))
    se2 = SearchEngine(docs2, text_col="body", variant="lucene")
    col = se2.search("spark engine", k=10, collapse="site",
                     fields={"title": 2.0, "body": 1.0})
    assert col.count() == 2  # one winner per site among matches


def test_mlt_feedback_facets(engine):
    se, _ = engine
    mlt = {r["doc_id"] for r in se.more_like_this(0, k=10).collect()}
    assert 0 not in mlt and mlt  # source excluded, neighbors found
    fb = se.feedback("alpha", fb_docs=2, fb_terms=2, k=10)
    assert fb.count() > 0
    fc = [(r["value"], r["count"]) for r in
          se.facets("alpha", "lang").collect()]
    assert fc == [("en", 2), ("de", 1)]
    fr = [(r["bucket"], r["count"]) for r in
          se.facet_ranges("alpha", "doc_id", 0.0, 2.0, 2).collect()]
    assert fr == [(0, 1), (1, 2)]


def test_sort_and_page(engine):
    se, _ = engine
    p1 = se.sort("alpha", "doc_id", k=2, ascending=True).orderBy(
        "rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in p1] == [(0, 1), (2, 2)]
    p2 = se.sort("alpha", "doc_id", k=2, ascending=True,
                 after=(p1[-1]["doc_id"], p1[-1]["doc_id"])).collect()
    assert [(r["doc_id"], r["rank"]) for r in p2] == [(3, 1)]


def test_explain_sums_to_score(spark, engine):
    from gensim_spark.operators import topk as T

    se, _ = engine
    hits = se.search("alpha beta", k=5).collect()
    exp = se.explain("alpha beta",
                     doc_ids=[h["doc_id"] for h in hits]).collect()
    by_doc = {}
    for r in exp:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) \
            + r["contribution"]
        assert r["token"] in {"alpha", "beta"}
        assert r["contribution"] == pytest.approx(
            r["weight"] * r["q_weight"], rel=1e-12)
    for h in hits:
        assert by_doc[h["doc_id"]] == pytest.approx(h["score"], rel=1e-12)
    # doc_ids prunes: only the requested docs appear
    one = se.explain("alpha beta", doc_ids=[hits[0]["doc_id"]]).collect()
    assert {r["doc_id"] for r in one} == {hits[0]["doc_id"]}
    assert se.explain("nosuch").count() == 0
