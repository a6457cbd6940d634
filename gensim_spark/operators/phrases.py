"""Phrase (collocation) detection — gensim ``Phrases``/``FrozenPhrases`` as
Spark plans, including connector-words bridging.

Reference semantics (gensim/models/phrases.py):

- vocab learn (phrases.py:578-611 ``_learn_vocab``): unigram counts over
  NON-connector tokens only; phrase counts over candidate spans
  ``word_a [connectors...] word_b`` where word_a/word_b are consecutive
  non-connector tokens — the phrase key is the delimiter-join of the FULL
  span ("bank_of_america"). Connector words (phrases.py:81-87
  ENGLISH_CONNECTOR_WORDS) never receive unigram counts;
  ``corpus_word_count`` counts ALL tokens including connectors.
- ``original_scorer`` (phrases.py:89-123, Mikolov et al. 2013):
  ``(bigram_count − min_count) · len_vocab / (count_a · count_b)`` where
  ``len_vocab = len(vocab)`` includes BOTH unigram and phrase keys
  (phrases.py:666-687).
- ``npmi_scorer`` (phrases.py:126-170): probs over corpus_word_count;
  −∞ (here: dropped) below min_count.
- detection is STRICT: ``score > threshold`` (phrases.py:686-688,788-790).
- apply (phrases.py:226-275 ``analyze_sentence`` + FrozenPhrases
  ``score_candidate`` :785-790): greedy left-to-right scan; connectors
  between a candidate's endpoints ride along in the merged token; a merged
  token never chains into the next candidate.

Scale: candidate extraction is a per-row linear scan inside one
Arrow-batched UDF — no explode+window shuffle of the token stream; the only
shuffles are the two hash-aggs (unigrams, phrase counts) with map-side
partial aggregation, plus broadcast joins of the (small) unigram counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

#: phrases.py:81-87 — articles/prepositions/conjunctions, incomplete on purpose
ENGLISH_CONNECTOR_WORDS = frozenset(
    " a an the "
    " for of with without at from to in on by "
    " and or "
    .split()
)

_CAND_TYPE = ArrayType(StructType([
    StructField("word_a", StringType()),
    StructField("word_b", StringType()),
    StructField("phrase", StringType()),
]))


def _candidates_udf(connector_words: frozenset[str], delimiter: str):
    """tokens array → candidate spans [(word_a, word_b, full-span phrase)].

    Mirrors _learn_vocab's scan (phrases.py:589-600): consecutive
    non-connector tokens pair up; connectors in between join the phrase key.
    """
    conn = frozenset(connector_words)

    @F.pandas_udf(_CAND_TYPE)
    def cands(tokens: pd.Series) -> pd.Series:
        def run(ts):
            if ts is None:
                return []
            out = []
            start, between = None, []
            for w in ts:
                if w not in conn:
                    if start is not None:
                        out.append(
                            (start, w, delimiter.join([start] + between + [w]))
                        )
                    start, between = w, []
                elif start is not None:
                    between.append(w)
            return out

        return tokens.map(run)

    return cands


def candidate_counts(docs: DataFrame, tokens_col: str = "tokens",
                     connector_words: frozenset[str] = frozenset(),
                     delimiter: str = "_") -> DataFrame:
    """(word_a, word_b, phrase, bigram_count) over candidate spans."""
    if not connector_words:
        # fast pure-JVM path: adjacent pairs via array slicing, no UDF
        pairs = docs.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col(tokens_col), 1,
                            F.greatest(F.size(tokens_col) - 1, F.lit(0))),
                    F.slice(F.col(tokens_col), 2,
                            F.greatest(F.size(tokens_col) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("word_a"), b.alias("word_b")),
                )
            ).alias("p")
        ).select(
            F.col("p.word_a").alias("word_a"),
            F.col("p.word_b").alias("word_b"),
        ).withColumn(
            "phrase", F.concat_ws(delimiter, F.col("word_a"), F.col("word_b"))
        )
    else:
        udf = _candidates_udf(connector_words, delimiter)
        pairs = docs.select(
            F.explode(udf(F.col(tokens_col))).alias("c")
        ).select("c.word_a", "c.word_b", "c.phrase")
    return pairs.groupBy("word_a", "word_b", "phrase").agg(
        F.count(F.lit(1)).alias("bigram_count")
    )


def bigram_counts(docs: DataFrame, tokens_col: str = "tokens",
                  doc_col: str = "doc_id",
                  connector_words: frozenset[str] = frozenset(),
                  delimiter: str = "_") -> DataFrame:
    """(word_a, word_b, bigram_count) — legacy adjacent-pair view (summed
    over distinct connector spans when connector_words is set)."""
    return (
        candidate_counts(docs, tokens_col, connector_words, delimiter)
        .groupBy("word_a", "word_b")
        .agg(F.sum("bigram_count").alias("bigram_count"))
    )


def unigram_counts(docs: DataFrame, tokens_col: str = "tokens",
                   doc_col: str = "doc_id",
                   connector_words: frozenset[str] = frozenset()) -> DataFrame:
    """(word, count) over non-connector tokens (phrases.py:591-592 —
    connector words never enter the unigram vocab)."""
    words = docs.select(F.explode(tokens_col).alias("word"))
    if connector_words:
        words = words.filter(~F.col("word").isin(list(connector_words)))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def scored_bigrams(docs: DataFrame, tokens_col: str = "tokens",
                   doc_col: str = "doc_id", min_count: int = 5,
                   scoring: str = "default",
                   connector_words: frozenset[str] = frozenset(),
                   delimiter: str = "_") -> DataFrame:
    """(word_a, word_b, phrase, bigram_count, score) for candidate phrases
    with bigram_count ≥ min_count.

    len_vocab = |unigram keys| + |phrase keys| — the reference scores with
    len(self.vocab), which holds BOTH (phrases.py:685-687); phrase keys are
    all distinct candidate spans, un-filtered by min_count.
    corpus_word_count counts ALL tokens incl. connectors (phrases.py:600).
    """
    uni = unigram_counts(docs, tokens_col, doc_col, connector_words)
    cand = candidate_counts(docs, tokens_col, connector_words, delimiter)
    vocab_len = uni.count() + cand.count()
    corpus_words = docs.select(
        F.sum(F.size(tokens_col)).alias("s")).collect()[0]["s"]
    bi = cand.filter(F.col("bigram_count") >= min_count)
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
    return j.select("word_a", "word_b", "phrase", "bigram_count",
                    score.alias("score"))


def export_phrases(docs: DataFrame, threshold: float = 10.0,
                   min_count: int = 5, tokens_col: str = "tokens",
                   doc_col: str = "doc_id",
                   scoring: str = "default",
                   connector_words: frozenset[str] = frozenset(),
                   delimiter: str = "_") -> DataFrame:
    """Detected phrases: score STRICTLY > threshold (phrases.py:686-688)."""
    return scored_bigrams(docs, tokens_col, doc_col, min_count, scoring,
                          connector_words, delimiter).filter(
        F.col("score") > threshold
    )


def find_phrases(docs: DataFrame, threshold: float = 10.0,
                 min_count: int = 5, tokens_col: str = "tokens",
                 doc_col: str = "doc_id", scoring: str = "default",
                 connector_words: frozenset[str] = frozenset(),
                 delimiter: str = "_") -> DataFrame:
    """``Phrases.find_phrases`` (phrases.py:654-692): phrases actually
    DETECTED by the greedy analyze_sentence scan over the corpus — unlike
    ``export_phrases``, a candidate consumed by an earlier overlapping phrase
    ("data_and_graph" eating "graph") never surfaces. Returns (phrase,
    score) distinct."""
    exported = export_phrases(docs, threshold, min_count, tokens_col,
                              doc_col, scoring, connector_words, delimiter)
    pg = {r["phrase"] for r in exported.select("phrase").collect()}
    conn = frozenset(connector_words)

    @F.pandas_udf(ArrayType(StringType()))
    def detected(tokens: pd.Series) -> pd.Series:
        def run(ts):
            if ts is None:
                return []
            out = []
            start, between = None, []
            for w in ts:
                if w not in conn:
                    if start is not None:
                        phrase = delimiter.join([start] + between + [w])
                        if phrase in pg:
                            out.append(phrase)
                            start, between = None, []
                        else:
                            start, between = w, []
                    else:
                        start, between = w, []
                elif start is not None:
                    between.append(w)
            return out

        return tokens.map(run)

    seen = (
        docs.select(F.explode(detected(F.col(tokens_col))).alias("phrase"))
        .distinct()
    )
    return seen.join(exported.select("phrase", "score"), "phrase")


def apply_phrases(docs: DataFrame, phrase_set, delimiter: str = "_",
                  tokens_col: str = "tokens",
                  connector_words: frozenset[str] = frozenset()) -> DataFrame:
    """FrozenPhrases transform (phrases.py:226-275 + :785-790): greedy
    left-to-right scan; a candidate span whose delimiter-join is in
    ``phrase_set`` merges into one token (connectors ride along); merged
    tokens never chain. ``phrase_set`` holds joined phrase strings
    ("new_york", "bank_of_america"); (a, b) tuples accepted for
    convenience. Broadcast set inside one Arrow-batched UDF."""
    phrases = {
        delimiter.join(p) if isinstance(p, tuple) else p for p in phrase_set
    }
    conn = frozenset(connector_words)

    @F.pandas_udf(ArrayType(StringType()))
    def merge(tokens: pd.Series) -> pd.Series:
        def run(ts):
            if ts is None:
                return None
            out = []
            start, between = None, []
            for w in ts:
                if w not in conn:
                    if start is not None:
                        phrase = delimiter.join([start] + between + [w])
                        if phrase in phrases:
                            out.append(phrase)
                            start, between = None, []
                        else:
                            out.append(start)
                            out.extend(between)
                            start, between = w, []
                    else:
                        start, between = w, []
                elif start is not None:
                    between.append(w)
                else:
                    out.append(w)
            if start is not None:
                out.append(start)
                out.extend(between)
            return out

        return tokens.map(run)

    return docs.withColumn(tokens_col, merge(F.col(tokens_col)))
