"""Relational operators: vocabulary build, doc2bow postings, weighting models
(BM25 family, TF-IDF SMART schemes, log-entropy), top-k query scoring, phrases,
dedup, similarity search, text statistics, topic models
(RP/LSI/LDA/NMF/HDP/LdaSeq/AuthorTopic/Ensemble), coherence, WMD,
embeddings training (Word2Vec/FastText/Doc2Vec/Poincaré) + KeyedVectors
queries, translation matrices."""

from gensim_spark.operators import (  # noqa: F401
    atmodel,
    bm25,
    bow,
    coherence,
    dedup,
    doc2vec,
    ensemble,
    fasttext,
    fuzzy,
    hdp,
    keyedvectors,
    lda,
    ldaseq,
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
    transport,
    vocab,
    wmd,
    word2vec,
)
