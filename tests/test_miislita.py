"""End-to-end vs published external numbers (gensim/test/test_miislita.py:84-103):
TF-IDF + cosine similarity reproduces the miislita tutorial's published
values to 2 decimals. Corpus = gensim/test/test_data/miIslita.cor (5 docs)."""

import pytest
from pyspark.sql import functions as F

MIISLITA_DOCS = [
    "LSI tutorials and fast tracks",
    "Books on semantic analysis",
    "Learning latent semantic indexing",
    "Advances in structures and advances in indexing",
    "Analysis of latent structures",
]
STOPLIST = set("for a of the and to in on".split())
QUERY = "latent semantic indexing"
EXPECTED = [0.0, 0.2560, 0.7022, 0.1524, 0.3334]


def _tokens(line):
    return [w for w in line.lower().split() if w not in STOPLIST]


def test_miislita_cosine(spark):
    from gensim_spark.operators import bow as B
    from gensim_spark.operators import tfidf as TF
    from gensim_spark.operators import vocab as V

    texts = [_tokens(d) for d in MIISLITA_DOCS]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, tokens array<string>"
    )
    vocab = V.build_vocab(df)
    postings = B.doc2bow_postings(df, vocab)
    n = len(texts)
    # TfidfModel(normalize=False) = SMART 'nfn'; SparseMatrixSimilarity then
    # unit-normalizes documents and the query → cosine
    weighted = TF.normalize_postings(
        TF.tfidf_postings(postings, vocab.select("term_id", "df"), n,
                          smartirs="nfn"),
        norm="l2",
    )
    qtoks = _tokens(QUERY)
    qdf = spark.createDataFrame([(100, qtoks)], "doc_id long, tokens array<string>")
    qpost = B.doc2bow_postings(qdf, vocab)
    qw = TF.normalize_postings(
        TF.tfidf_postings(qpost, vocab.select("term_id", "df"), n,
                          smartirs="nfn"),
        norm="l2",
    ).select("term_id", F.col("weight").alias("q_weight"))
    sims = (
        weighted.join(qw, "term_id")
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("q_weight")).alias("sim"))
    )
    got = {r["doc_id"]: r["sim"] for r in sims.collect()}
    for i, want in enumerate(EXPECTED):
        assert got.get(i, 0.0) == pytest.approx(want, abs=5e-3), i
