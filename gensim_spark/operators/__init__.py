"""Relational operators: vocabulary build, doc2bow postings, weighting models
(BM25 family, TF-IDF SMART schemes, log-entropy), top-k query scoring, phrases,
dedup, similarity search, text statistics, topic models (RP/LSI/LDA/NMF),
coherence, WMD, embeddings training (Word2Vec/Doc2Vec) + KeyedVectors
queries, translation matrices."""

from gensim_spark.operators import (  # noqa: F401
    bm25,
    bow,
    coherence,
    dedup,
    ensemble,
    fasttext,
    fuzzy,
    keyedvectors,
    lda,
    lsi,
    matutils,
    multimodal,
    nmf,
    phrases,
    poincare,
    rp,
    simsearch,
    softcosine,
    textstats,
    tfidf,
    topk,
    translation,
    vocab,
    wmd,
    word2vec,
)
