"""Bigram phrase detection (gensim ``Phrases``) as window + join-agg plans.

Reference semantics (gensim/models/phrases.py):
- vocab learn: unigram + bigram counts over the token stream
  (phrases.py:579-611) ≙ ``lead(token) over (partition by doc order by pos)``
  then hash-agg.
- ``original_scorer`` (phrases.py:89-121, Mikolov et al. 2013):
  ``(bigram_count − min_count) · vocab_len / (count_a · count_b)``.
- ``npmi_scorer`` (phrases.py:124-167):
  ``ln(prob(a,b)/(prob(a)·prob(b))) / −ln(prob(a,b))`` with probs over
  corpus_word_count; bigrams below min_count score −∞ (here: NULL).
- export_phrases: bigrams with score ≥ threshold (phrases.py:709-).

Scale: two hash-agg shuffles (unigrams, bigrams) + broadcast join of unigram
counts onto bigrams. The per-doc window is partitioned by doc_id — never
global.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bigram_counts(docs: DataFrame, tokens_col: str = "tokens",
                  doc_col: str = "doc_id") -> DataFrame:
    """(word_a, word_b, bigram_count) over adjacent token pairs per doc."""
    pos = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(tokens_col).alias("pos", "word_a"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = pos.withColumn("word_b", F.lead("word_a").over(w)).filter(
        F.col("word_b").isNotNull()
    )
    return pairs.groupBy("word_a", "word_b").agg(
        F.count(F.lit(1)).alias("bigram_count")
    )


def unigram_counts(docs: DataFrame, tokens_col: str = "tokens",
                   doc_col: str = "doc_id") -> DataFrame:
    return (
        docs.select(F.explode(tokens_col).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def scored_bigrams(docs: DataFrame, tokens_col: str = "tokens",
                   doc_col: str = "doc_id", min_count: int = 5,
                   scoring: str = "default") -> DataFrame:
    """(word_a, word_b, bigram_count, score) for bigrams with
    bigram_count ≥ min_count."""
    uni = unigram_counts(docs, tokens_col, doc_col)
    bi = bigram_counts(docs, tokens_col, doc_col).filter(
        F.col("bigram_count") >= min_count
    )
    vocab_len = uni.count()
    corpus_words = uni.agg(F.sum("count")).collect()[0][0]
    j = (
        bi.join(F.broadcast(uni.withColumnRenamed("word", "word_a")
                            .withColumnRenamed("count", "count_a")), "word_a")
        .join(F.broadcast(uni.withColumnRenamed("word", "word_b")
                          .withColumnRenamed("count", "count_b")), "word_b")
    )
    if scoring == "default":
        score = (
            (F.col("bigram_count") - F.lit(min_count)).cast("double")
            * F.lit(float(vocab_len))
            / (F.col("count_a") * F.col("count_b")).cast("double")
        )
    elif scoring == "npmi":
        pa = F.col("count_a") / F.lit(float(corpus_words))
        pb = F.col("count_b") / F.lit(float(corpus_words))
        pab = F.col("bigram_count") / F.lit(float(corpus_words))
        score = F.log(pab / (pa * pb)) / -F.log(pab)
    else:
        raise ValueError(f"unknown scoring {scoring!r}")
    return j.select("word_a", "word_b", "bigram_count", score.alias("score"))


def apply_phrases(docs: DataFrame, phrase_set: set[tuple[str, str]],
                  delimiter: str = "_", tokens_col: str = "tokens") -> DataFrame:
    """FrozenPhrases transform (phrases.py:226-275 ``analyze_sentence``):
    greedy left-to-right merge — when (tokens[i], tokens[i+1]) is a detected
    phrase, emit ``a_b`` and skip both; merged tokens never chain into the
    next pair. Broadcast phrase set inside an Arrow-batched UDF."""
    from pyspark.sql.types import ArrayType, StringType

    phrases = {f"{a}\0{b}" for a, b in phrase_set}

    @F.pandas_udf(ArrayType(StringType()))
    def merge(tokens: pd.Series) -> pd.Series:
        def run(ts):
            if ts is None:
                return None
            out = []
            i = 0
            n = len(ts)
            while i < n:
                if i + 1 < n and f"{ts[i]}\0{ts[i + 1]}" in phrases:
                    out.append(ts[i] + delimiter + ts[i + 1])
                    i += 2
                else:
                    out.append(ts[i])
                    i += 1
            return out

        return tokens.map(run)

    return docs.withColumn(tokens_col, merge(F.col(tokens_col)))


def export_phrases(docs: DataFrame, threshold: float = 10.0,
                   min_count: int = 5, tokens_col: str = "tokens",
                   doc_col: str = "doc_id",
                   scoring: str = "default") -> DataFrame:
    """Phrases with score ≥ threshold (phrases.py export_phrases)."""
    return scored_bigrams(docs, tokens_col, doc_col, min_count, scoring).filter(
        F.col("score") >= threshold
    )
