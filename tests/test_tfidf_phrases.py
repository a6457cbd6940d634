"""SMART-IRS variants, pivoted norm, NormModel, phrases scorers, and the
remaining vocab maintenance ops — formula-oracle tests."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import docs_df
from tests.oracle import PyDictionary


def _postings_and_dfs(spark, texts):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import vocab as V

    df = docs_df(spark, texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    return postings, vocab.select("term_id", "df"), PyDictionary(texts)


def _py_tfidf(odict, texts, smartirs, pivot=None, slope=0.65, eps=1e-12):
    """Independent SMART implementation from tfidfmodel.py:153-208 formulas."""
    w_tf, w_df, w_n = smartirs
    if w_tf == "t":
        w_tf = "n"
    n = odict.num_docs
    out = {}
    for i, doc in enumerate(texts):
        bow = odict.doc2bow(doc)
        tfs = {t: f for t, f in bow}
        max_tf = max(tfs.values())
        mean_tf = sum(tfs.values()) / len(tfs)
        vec = {}
        for t, f in bow:
            if w_tf == "n":
                local = float(f)
            elif w_tf == "l":
                local = 1 + math.log2(f)
            elif w_tf == "d":
                local = 1 + math.log2(1 + math.log2(f))
            elif w_tf == "a":
                local = 0.5 + 0.5 * f / max_tf
            elif w_tf == "L":
                local = (1 + math.log2(f)) / (1 + math.log2(mean_tf))
            elif w_tf == "b":
                local = 1.0 if f else 0.0
            df = odict.dfs[t]
            if w_df in ("n", "x"):
                glob = 1.0
            elif w_df == "f":
                glob = math.log2(n / df)
            elif w_df == "t":
                glob = math.log2((n + 1.0) / df)
            elif w_df == "p":
                glob = max(0.0, math.log2((n - df) / df))
            if abs(glob) > eps:
                vec[t] = local * glob
        if w_n == "c" and pivot is None:
            norm = math.sqrt(sum(v * v for v in vec.values()))
            if norm > 0:
                vec = {t: v / norm for t, v in vec.items()}
        elif pivot is not None:
            norm = math.sqrt(sum(v * v for v in vec.values()))
            vec = {t: v / ((1 - slope) * pivot + slope * norm)
                   for t, v in vec.items()}
        for t, v in vec.items():
            out[(i, t)] = v
    return out


@pytest.mark.parametrize("smartirs", ["nfc", "bnn", "lfc", "dtn", "afc",
                                      "Lpc", "ntc"])
def test_smartirs_variants(spark, common_texts, smartirs):
    from gensim_spark.operators import tfidf as TF

    postings, dfs, odict = _postings_and_dfs(spark, common_texts)
    got = {
        (r["doc_id"], r["term_id"]): r["weight"]
        for r in TF.tfidf_postings(postings, dfs, odict.num_docs,
                                   smartirs=smartirs).collect()
    }
    want = _py_tfidf(odict, common_texts, smartirs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), (smartirs, k)


def test_pivoted_normalization(spark, common_texts):
    from gensim_spark.operators import tfidf as TF

    postings, dfs, odict = _postings_and_dfs(spark, common_texts)
    pivot = TF.auto_pivot_u(odict.num_nnz, odict.num_docs)
    got = {
        (r["doc_id"], r["term_id"]): r["weight"]
        for r in TF.tfidf_postings(postings, dfs, odict.num_docs,
                                   smartirs="nfu", pivot=pivot).collect()
    }
    want = _py_tfidf(odict, common_texts, "nfu", pivot=pivot)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


@pytest.mark.parametrize("norm", ["l1", "l2", "unique"])
def test_norm_model(spark, common_texts, norm):
    from gensim_spark.operators import tfidf as TF

    postings, _, odict = _postings_and_dfs(spark, common_texts)
    weighted = postings.select(
        "doc_id", "term_id", F.col("tf").cast("double").alias("weight")
    )
    got = {
        (r["doc_id"], r["term_id"]): r["weight"]
        for r in TF.normalize_postings(weighted, norm=norm).collect()
    }
    for i, doc in enumerate(common_texts):
        bow = odict.doc2bow(doc)
        if norm == "l1":
            length = float(sum(abs(v) for _, v in bow))
        elif norm == "l2":
            length = math.sqrt(sum(v * v for _, v in bow))
        else:
            length = float(len(bow))
        for t, v in bow:
            assert got[(i, t)] == pytest.approx(v / length, rel=1e-12)


def test_phrases_scorers(spark):
    from gensim_spark.operators import phrases as PH

    texts = [["new", "york", "city"], ["new", "york", "times"],
             ["york", "city", "hall"], ["new", "york"]] * 3
    df = docs_df(spark, texts)
    uni = {}
    bi = {}
    for doc in texts:
        for w in doc:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(doc, doc[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    vocab_len = len(uni)
    corpus_words = sum(uni.values())
    min_count = 2
    got = {
        (r["word_a"], r["word_b"]): (r["bigram_count"], r["score"])
        for r in PH.scored_bigrams(df, min_count=min_count).collect()
    }
    for (a, b), cnt in bi.items():
        if cnt < min_count:
            assert (a, b) not in got
            continue
        want = (cnt - min_count) * vocab_len / (uni[a] * uni[b])
        assert got[(a, b)][1] == pytest.approx(want, rel=1e-12)
    npmi = {
        (r["word_a"], r["word_b"]): r["score"]
        for r in PH.scored_bigrams(df, min_count=min_count,
                                   scoring="npmi").collect()
    }
    for (a, b), cnt in bi.items():
        if cnt < min_count:
            continue
        pa, pb, pab = (uni[a] / corpus_words, uni[b] / corpus_words,
                       cnt / corpus_words)
        want = math.log(pab / (pa * pb)) / -math.log(pab)
        assert npmi[(a, b)] == pytest.approx(want, rel=1e-12)


def test_filter_n_most_frequent(spark, common_texts):
    from gensim_spark.operators import vocab as V

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    odict = PyDictionary(common_texts)
    out = V.filter_n_most_frequent(vocab, 3)
    # reference: drop top-3 by (df desc, id asc), compactify by old-id order
    ranked = sorted(odict.dfs.items(), key=lambda p: (-p[1], p[0]))
    dropped = {t for t, _ in ranked[:3]}
    kept_old = sorted(t for t in odict.dfs if t not in dropped)
    remap = {old: new for new, old in enumerate(kept_old)}
    id2tok = {v: k for k, v in odict.token2id.items()}
    want = {id2tok[old]: new for old, new in remap.items()}
    got = {r["token"]: r["term_id"] for r in out.collect()}
    assert got == want


def test_vocab_transform(spark, common_texts):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import tfidf as TF
    from gensim_spark.operators import vocab as V

    df = docs_df(spark, common_texts)
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    id_map = spark.createDataFrame(
        [(0, 100), (1, 200)], "old_id long, new_id long"
    )
    out = TF.vocab_transform(postings, id_map)
    ids = {r["term_id"] for r in out.select("term_id").distinct().collect()}
    assert ids <= {100, 200}
    n_in = postings.filter(F.col("term_id").isin([0, 1])).count()
    assert out.count() == n_in
