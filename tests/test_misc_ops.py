"""similarity_by_id, toptexts, patch_with_special_tokens, apply_phrases,
CSV corpus."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import docs_df
from tests.oracle import PyBM25, PyDictionary, py_topk


def test_similarity_by_id(spark, common_texts):
    from gensim_spark.operators import topk as T
    from gensim_spark.plans import pipeline as P

    idx = P.build(docs_df(spark, common_texts), num_docs=len(common_texts))
    out = T.similarity_by_id(idx.weighted, 3, k=5).orderBy("rank").collect()
    # oracle: score = Σ_t w(3,t)·w(d,t) over shared terms
    odict = PyDictionary(common_texts)
    model = PyBM25(dictionary=odict)
    corpus = [dict(model.transform(odict.doc2bow(d))) for d in common_texts]
    qv = corpus[3]
    scores = []
    for d, vec in enumerate(corpus):
        s = sum(w * qv[t] for t, w in vec.items() if t in qv)
        if s != 0.0:
            scores.append((d, s))
    scores.sort(key=lambda p: (-abs(p[1]), p[0]))
    want = scores[:5]
    assert [(r["doc_id"]) for r in out] == [d for d, _ in want]
    for r, (_, ws) in zip(out, want):
        assert r["score"] == pytest.approx(ws, rel=1e-9)
    # self is rank 1 (highest self-similarity); exclude_self drops it
    assert out[0]["doc_id"] == 3
    out2 = T.similarity_by_id(idx.weighted, 3, k=5, exclude_self=True).collect()
    assert all(r["doc_id"] != 3 for r in out2)


def test_toptexts(spark, common_texts):
    from gensim_spark.operators import topk as T
    from gensim_spark.plans import pipeline as P

    idx = P.build(docs_df(spark, common_texts), num_docs=len(common_texts))
    odict = PyDictionary(common_texts)
    q = T.query_terms_df(spark, {0: [odict.token2id["graph"]]})
    scores = T.score(idx.weighted, q)
    texts = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(common_texts)],
        "doc_id long, text string",
    )
    rows = T.toptexts(scores, texts, n=2).collect()
    assert len(rows) == 2
    assert all("graph" in r["text"] for r in rows)


def test_patch_with_special_tokens(spark, common_texts):
    from gensim_spark.operators import vocab as V

    vocab = V.build_vocab(docs_df(spark, common_texts))
    odict = PyDictionary(common_texts)
    target_tok = next(t for t, i in odict.token2id.items() if i == 0)
    patched = V.patch_with_special_tokens(vocab, {"[PAD]": 0})
    got = {r["token"]: r["term_id"] for r in patched.collect()}
    assert got["[PAD]"] == 0
    # displaced holder of id 0 moved to a fresh id; ids stay unique
    assert got[target_tok] != 0
    ids = sorted(got.values())
    assert len(ids) == len(set(ids))
    # existing token forced onto an existing id swaps the two
    a = next(t for t, i in odict.token2id.items() if i == 1)
    b = next(t for t, i in odict.token2id.items() if i == 4)
    swapped = {r["token"]: r["term_id"] for r in
               V.patch_with_special_tokens(vocab, {a: 4}).collect()}
    assert swapped[a] == 4 and swapped[b] == 1


def test_apply_phrases(spark):
    from gensim_spark.operators import phrases as PH

    docs = docs_df(spark, [
        ["new", "york", "city", "new", "york"],
        ["a", "new", "york", "b"],
        ["new", "new", "york"],
    ])
    out = {r["doc_id"]: r["tokens"] for r in
           PH.apply_phrases(docs, {("new", "york")}).collect()}
    assert out[0] == ["new_york", "city", "new_york"]
    assert out[1] == ["a", "new_york", "b"]
    # greedy left-to-right: first 'new' pairs with 'new'? no — ('new','new')
    # is not a phrase, so merge happens at position 1
    assert out[2] == ["new", "new_york"]


def test_csv_corpus(spark, tmp_path):
    from gensim_spark.sources.formats import read_csv_corpus

    f = tmp_path / "c.csv"
    f.write_text("1.0,0.5,0.0\n0.0,2.0,3.0\n")
    out = read_csv_corpus(spark, str(f))
    got = {(r["doc_id"], r["term_id"]): r["weight"] for r in out.collect()}
    assert got == {(0, 0): 1.0, (0, 1): 0.5, (0, 2): 0.0,
                   (1, 0): 0.0, (1, 1): 2.0, (1, 2): 3.0}
