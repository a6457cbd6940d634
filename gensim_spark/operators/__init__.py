"""Relational operators: vocabulary build, doc2bow postings, weighting models
(BM25 family, TF-IDF SMART schemes, log-entropy), top-k query scoring, phrases,
dedup, similarity search, text statistics."""

from gensim_spark.operators import bm25, bow, tfidf, topk, vocab  # noqa: F401
