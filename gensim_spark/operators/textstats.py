"""Text analysis operators: quality scoring, language-ID heuristic, token
counting, document fingerprinting.

Training-data-pipeline surface (not in the gensim reference): the per-document
quality/selection signals a 100 TB corpus build computes before indexing.
Everything is a narrow JVM-side projection (regexp/array expressions —
whole-stage codegen, no shuffle, no Python), so these run at scan speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gensim_spark.functions.stopwords import STOPWORDS

# deterministic marker-word sets for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por"],
}


def token_count_col(tokens: Column) -> Column:
    return F.size(tokens)


def stopword_count_col(tokens: Column, words=None) -> Column:
    # isin over 337 literals compiles to InSet (hash-set membership, O(1) per
    # token) — array_contains against an array literal would scan all 337
    # elements per token.
    ws = sorted(words or STOPWORDS)
    return F.size(F.filter(tokens, lambda t: t.isin(ws)))


def quality_stats(docs: DataFrame, text_col: str = "text",
                  tokens_col: str = "tokens",
                  doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
    alpha_ratio, quality): composite heuristic quality score in [0, 1]."""
    toks = F.col(tokens_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("double")
    mean_tok = F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0,
        stopword_count_col(toks).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")).cast("double")
        / n_chars,
    ).otherwise(F.lit(0.0))
    # quality: enough tokens, sane mean token length, some (but not all) stopwords
    quality = (
        F.when(n_tokens >= 10, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(quality, 2).alias("quality"),
    )


def lang_id(docs: DataFrame, tokens_col: str = "tokens",
            doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, lang_score): marker-word-ratio language heuristic.
    Deterministic tie-break: highest ratio wins, then language code ascending."""
    toks = F.col(tokens_col)
    n = F.size(toks)
    ratios = {}
    for lang in sorted(_LANG_MARKERS):
        markers = list(_LANG_MARKERS[lang])
        cnt = F.size(F.filter(toks, lambda t: t.isin(markers)))
        ratios[lang] = F.when(n > 0, cnt.cast("double") / n).otherwise(F.lit(0.0))
    best = F.greatest(*ratios.values())
    pred = F.lit("unk")
    # CASE checks in lang-ascending order → smallest code wins score ties
    chain = F.when(best < 0.05, F.lit("unk"))
    for lang in sorted(_LANG_MARKERS):
        chain = chain.when(ratios[lang] == best, F.lit(lang))
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        chain.otherwise(pred).alias("pred_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     tokens_col: str = "tokens",
                     doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
    top_2gram_frac, dup_5gram_frac): Gopher-style within-document repetition
    signals — the standard web-corpus quality filters (boilerplate menus,
    SEO keyword stuffing, template spam).

    * dup_line_frac / dup_para_frac: fraction of non-empty trimmed
      lines/paragraphs that are repeats of an earlier one
      (1 − distinct/total).
    * dup_line_char_frac: fraction of line characters contained in those
      repeats (1 − distinct_chars/total_chars).
    * top_2gram_frac: occurrences of the most frequent token 2-gram over
      total 2-grams.
    * dup_5gram_frac: fraction of token 5-grams that are repeats.

    Scale shape: line/paragraph stats are pure JVM array expressions
    (``array_distinct`` — whole-stage codegen, zero shuffle); the n-gram
    stats run in ONE Arrow-batched pandas UDF with a linear Counter per doc
    (the JVM alternative — count-via-nested-filter over distinct grams — is
    O(n²) per doc, wrong for long web pages). No shuffle anywhere: runs at
    scan speed, embarrassingly parallel at any corpus size.
    """
    def _dup_fracs(arr: Column) -> tuple[Column, Column]:
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        chars = F.aggregate(arr, F.lit(0),
                            lambda a, x: a + F.length(x)).cast("double")
        chars_d = F.aggregate(F.array_distinct(arr), F.lit(0),
                              lambda a, x: a + F.length(x)).cast("double")
        frac = F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0))
        cfrac = F.when(chars > 0.0,
                       (chars - chars_d) / chars).otherwise(F.lit(0.0))
        return frac, cfrac

    def _clean(arr: Column) -> Column:
        return F.filter(F.transform(arr, lambda x: F.trim(x)),
                        lambda x: x != "")

    lines = _clean(F.split(F.col(text_col), "\n"))
    paras = _clean(F.split(F.col(text_col), "\n{2,}"))
    line_frac, line_cfrac = _dup_fracs(lines)
    para_frac, _ = _dup_fracs(paras)

    @F.pandas_udf("top_2gram_frac double, dup_5gram_frac double")
    def _ngram_rep(tokens: pd.Series) -> pd.DataFrame:
        from collections import Counter

        top2, dup5 = [], []
        for toks in tokens:
            ts = list(toks) if toks is not None else []
            g2 = Counter(zip(ts, ts[1:]))
            t2 = sum(g2.values())
            top2.append(max(g2.values()) / t2 if t2 else 0.0)
            g5 = Counter(tuple(ts[i:i + 5]) for i in range(len(ts) - 4))
            t5 = sum(g5.values())
            dup5.append((t5 - len(g5)) / t5 if t5 else 0.0)
        return pd.DataFrame({"top_2gram_frac": top2, "dup_5gram_frac": dup5})

    ng = _ngram_rep(F.col(tokens_col))
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        F.round(line_frac, 6).alias("dup_line_frac"),
        F.round(line_cfrac, 6).alias("dup_line_char_frac"),
        F.round(para_frac, 6).alias("dup_para_frac"),
        F.round(ng["top_2gram_frac"], 6).alias("top_2gram_frac"),
        F.round(ng["dup_5gram_frac"], 6).alias("dup_5gram_frac"),
    )


def fingerprint(docs: DataFrame, tokens_col: str = "tokens",
                doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp): md5 fingerprint of the normalized token stream — the
    canonical 'same content after normalization' identity."""
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.col(tokens_col))).alias("fp"),
    )
