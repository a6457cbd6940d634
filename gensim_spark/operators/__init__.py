"""Relational operators: vocabulary build, doc2bow postings, weighting models
(BM25 family, TF-IDF SMART schemes, log-entropy), top-k query scoring, phrases,
dedup, similarity search, text statistics."""

from gensim_spark.operators import (  # noqa: F401
    bm25,
    bow,
    dedup,
    fuzzy,
    matutils,
    multimodal,
    phrases,
    simsearch,
    softcosine,
    textstats,
    tfidf,
    topk,
    vocab,
)
