"""Spark-facing text preparation: vectorized Arrow UDFs + JVM column exprs.

Design (SURVEY.md §2.2): everything that must be *byte-identical* with the
reference (Python ``re`` semantics for unicode ``\\w``, deaccent, entity
decoding, Porter stemming) runs as a **pandas UDF** over Arrow batches — no
per-row Python anywhere (input_hint mandate). Everything that is exactly
expressible in Catalyst (length filters, stopword array_except, whitespace
collapse on ASCII) also has a JVM-side variant so plans can stay inside
whole-stage codegen when unicode parity is not required.

Reference semantics: gensim/utils.py:226-313 (tokenize/simple_preprocess),
gensim/parsing/preprocessing.py:398-445 (preprocess_string); see textref.py.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gensim_spark.functions import textref


# --- pandas UDFs (Arrow-batched; the parity path) ---------------------------

@F.pandas_udf(StringType())
def extract_html_text_udf(html: pd.Series) -> pd.Series:
    """html (binary or string) → extracted plain text, per url byte-identical
    with a driver-local ``textref.extract_html_text`` call."""
    return html.map(lambda h: textref.extract_html_text(h) if h is not None else None)


@F.pandas_udf(ArrayType(StringType()))
def simple_preprocess_udf(text: pd.Series) -> pd.Series:
    """gensim.utils.simple_preprocess: lower → PAT_ALPHABETIC tokens →
    keep 2 ≤ len ≤ 15, drop '_'-prefixed (gensim/utils.py:287-313)."""
    return text.map(lambda t: textref.simple_preprocess(t) if t is not None else None)


@F.pandas_udf(ArrayType(StringType()))
def simple_preprocess_deacc_udf(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: textref.simple_preprocess(t, deacc=True) if t is not None else None
    )


@F.pandas_udf(ArrayType(StringType()))
def simple_tokenize_udf(text: pd.Series) -> pd.Series:
    """Raw PAT_ALPHABETIC tokens, no case folding (gensim/utils.py:269-284)."""
    return text.map(
        lambda t: list(textref.simple_tokenize(t)) if t is not None else None
    )


@F.pandas_udf(StringType())
def deaccent_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textref.deaccent(t) if t is not None else None)


@F.pandas_udf(StringType())
def decode_htmlentities_udf(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: textref.decode_htmlentities(t) if t is not None else None
    )


@F.pandas_udf(StringType())
def stem_text_udf(text: pd.Series) -> pd.Series:
    """Porter-stem each whitespace-separated word (memoized per executor)."""
    return text.map(lambda t: textref.stem_text(t) if t is not None else None)


@F.pandas_udf(ArrayType(StringType()))
def preprocess_string_udf(text: pd.Series) -> pd.Series:
    """Full default filter chain (lower→tags→punct→ws→numeric→stop→short→stem),
    gensim/parsing/preprocessing.py:398-445."""
    return text.map(
        lambda t: textref.preprocess_string(t) if t is not None else None
    )


_BOW_TYPE = ArrayType(
    StructType([
        StructField("token", StringType()),
        StructField("tf", LongType()),
    ])
)


@F.pandas_udf(_BOW_TYPE)
def bow_counts_udf(tokens: pd.Series) -> pd.Series:
    """tokens → [(token, tf)] sorted by token — the per-document Counter of
    ``doc2bow`` (gensim/corpora/dictionary.py:244-247) fused into the Arrow
    batch, so the postings build needs NO doc-keyed shuffle at all."""
    return tokens.map(
        lambda ts: sorted(Counter(ts).items()) if ts is not None else None
    )


# --- JVM-side column expressions (codegen path, exact on ASCII) -------------

# Catalyst regex is Java; on ASCII text these are equivalent to the Python
# patterns. PAT_ALPHABETIC "(((?!\d)\w)+)" over ASCII == runs of [A-Za-z_].
ASCII_TOKEN_PATTERN = "[a-zA-Z_]+"


def tokens_col(
    text: Column, min_len: int = 2, max_len: int = 15, ascii_fast_path: bool = False
) -> Column:
    """simple_preprocess as a column. Default = pandas UDF (unicode-exact);
    ``ascii_fast_path=True`` stays JVM-side (whole-stage codegen) and is exact
    whenever the corpus is ASCII (e.g. the synthetic bench tables)."""
    if not ascii_fast_path:
        return simple_preprocess_udf(text)
    toks = F.regexp_extract_all(F.lower(text), F.lit(ASCII_TOKEN_PATTERN), 0)
    return F.filter(
        toks,
        lambda t: (F.length(t) >= min_len)
        & (F.length(t) <= max_len)
        & ~t.startswith("_"),
    )


def strip_tags_col(text: Column) -> Column:
    """gensim strip_tags: ``<([^>]+)>`` → '' (preprocessing.py:147-169)."""
    return F.regexp_replace(text, "<([^>]+)>", "")


def strip_numeric_col(text: Column) -> Column:
    return F.regexp_replace(text, "[0-9]+", "")


def strip_multiple_whitespaces_col(text: Column) -> Column:
    return F.regexp_replace(text, r"(\s)+", " ")


def remove_stopword_tokens_col(tokens: Column, stopwords=None) -> Column:
    """array_except against a literal stopword set — JVM-side, order-preserving
    filter (array_except would dedup, so use filter + array_contains)."""
    stop = F.array(*[F.lit(w) for w in sorted(stopwords or textref.STOPWORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(stop, t))


def remove_short_tokens_col(tokens: Column, minsize: int = 3) -> Column:
    return F.filter(tokens, lambda t: F.length(t) >= minsize)


# --- document-level pipeline helpers ----------------------------------------

BOW_LONG_SCHEMA = "doc_id long, token string, tf long, dl long"


def extract_tokenize_bow(pages: DataFrame, html_col: str = "html",
                         doc_col: str = "doc_id") -> DataFrame:
    """pages(doc_id, html, …) → (doc_id, token, tf, dl) in ONE Python pass.

    The full per-document text layer — extraction cascade, simple_preprocess
    tokenization, doc2bow Counter, doc length — fused into a single
    ``mapInPandas`` stage: one JVM↔Python Arrow crossing, plain columnar
    output (no array-of-struct conversion). This is the north-rule build
    front-end: everything after it is narrow until the vocab aggregation.
    """
    from gensim_spark.functions import textref

    def batches(it):
        from collections import Counter

        for pdf in it:
            out_doc, out_tok, out_tf, out_dl = [], [], [], []
            for doc_id, html in zip(pdf[doc_col], pdf[html_col]):
                text = textref.extract_html_text(html)
                toks = textref.simple_preprocess(text)
                dl = len(toks)
                for t, f in sorted(Counter(toks).items()):
                    out_doc.append(doc_id)
                    out_tok.append(t)
                    out_tf.append(f)
                    out_dl.append(dl)
            yield pd.DataFrame(
                {"doc_id": out_doc, "token": out_tok, "tf": out_tf,
                 "dl": out_dl}
            )

    return pages.select(doc_col, html_col).mapInPandas(
        batches, schema=BOW_LONG_SCHEMA
    )

def extract_pages(pages: DataFrame, html_col: str = "html",
                  out_col: str = "text") -> DataFrame:
    """pages(url, warc_ts, html, …) → + extracted ``text`` column.

    One narrow mapInPandas-equivalent projection; no shuffle. At 10^12 rows
    this is the embarrassingly-parallel stage — partition count follows the
    input file splits, Arrow batch size bounds per-task Python memory.
    """
    return pages.withColumn(out_col, extract_html_text_udf(F.col(html_col)))


def tokenize_pages(
    pages: DataFrame,
    text_col: str = "text",
    tokens_col_name: str = "tokens",
    ascii_fast_path: bool = False,
) -> DataFrame:
    """pages → + ``tokens: array<string>`` via simple_preprocess semantics.

    The input is width-guarded first (scanwidth.widen_if_narrow): a
    single-row-group parquet input would otherwise pin tokenization AND
    every downstream token consumer to one task. No-op on real multi-split
    corpora."""
    from gensim_spark.functions.scanwidth import widen_if_narrow

    return widen_if_narrow(pages).withColumn(
        tokens_col_name, tokens_col(F.col(text_col), ascii_fast_path=ascii_fast_path)
    )
