"""gensim_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

A from-scratch re-expression of gensim's retrieval surface (Dictionary token-id
mapping, doc2bow term frequencies, Okapi/Lucene/Atire BM25 scoring,
SparseMatrixSimilarity-style top-k) as Spark DataFrame plans:

- ``gensim_spark.functions``  — text extraction / tokenization (vectorized Arrow UDFs
  plus JVM-side column expressions where exact).
- ``gensim_spark.operators``  — vocabulary build, doc2bow postings, weighting models
  (BM25 family, TF-IDF SMART schemes, log-entropy), top-k scoring, dedup,
  similarity search, text statistics.
- ``gensim_spark.index``      — sharded posting-list layout (sorted runs,
  delta+varint packing, head-term salting), checkpointed build plan, block-max
  WAND query path.
- ``gensim_spark.sources``    — corpus format readers/writers (Matrix Market, text
  corpora, and friends).
- ``gensim_spark.streaming``  — incremental index maintenance with Structured
  Streaming.

Reference semantics: piskvorky/gensim (see SURVEY.md for the file:line map).
The execution strategy is Spark-first — declarative DataFrame plans optimized by
Catalyst — not a port of gensim's scipy/numpy engine.
"""

__version__ = "0.1.0"

from gensim_spark.session import get_spark  # noqa: F401
