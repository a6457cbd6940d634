"""Deterministic synthetic Common-Crawl-style pages (the input_hint shape).

Generates ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` fully JVM-side (Spark ``range`` + hash expressions — no Python,
no driver-side data, no RNG), so a 10^8-row bench corpus materializes at scan
speed and is bit-identical across runs and cluster sizes.

Token distribution is zipf-ish over a fixed word list via a squared-hash
trick: word index = (h % V²-ish) mapped through a power transform, giving the
head-term skew that exercises salting and the negative-idf ε-clamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed 64-word vocabulary; head words land in >50% of docs (ε-clamp fodder)
WORDS = [
    "the", "data", "spark", "query", "table", "index", "scan", "join",
    "merge", "sort", "hash", "group", "filter", "batch", "stream", "window",
    "row", "column", "value", "key", "order", "part", "line", "customer",
    "small", "big", "fast", "slow", "agg", "shuffle", "broadcast", "salt",
    "term", "token", "corpus", "vocab", "posting", "shard", "block", "wand",
    "score", "rank", "weight", "norm", "cosine", "vector", "embed", "cluster",
    "page", "crawl", "html", "text", "lang", "parse", "extract", "dedup",
    "jaccard", "minhash", "simhash", "fingerprint", "quality", "stopword",
    "bigram", "phrase",
]


def generate_pages(spark: SparkSession, n_docs: int, tokens_per_doc: int = 200,
                   partitions: int | None = None) -> DataFrame:
    """n_docs synthetic pages. Deterministic: doc i token j =
    WORDS[(xxhash64(i, j) % V²) mapped by integer sqrt] — a discrete
    zipf-like skew (word 0 ≈ 12% of all positions).

    The html wrapper is deliberately web-realistic per sentence: nested tags
    with attributes, entities, comments, and a script/style block, so the
    extraction cascade (decode entities → drop script/style → strip tags)
    does Common-Crawl-like per-byte work rather than trivially unwrapping one
    ``<p>``.
    """
    v = len(WORDS)
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    base = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "doc_id")
    words_lit = F.array(*[F.lit(w) for w in WORDS])
    # token j: skewed index = floor(sqrt(u)) where u uniform in [0, v²)
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.element_at(
            words_lit,
            (F.floor(F.sqrt(
                F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(v * v))
                .cast("double")
            )) + 1).cast("int"),
        ),
    )
    text = F.concat_ws(" ", tok)
    # per-token markup with crawl-realistic attribute, entity and comment
    # noise (~100 bytes of markup per text token; real web pages are heavy on
    # entities and inline comments, which is where extraction spends cycles)
    marked = F.transform(
        tok,
        lambda w: F.concat(
            F.lit('<span class="t tok inline-block m-0 p-1 w-'), w,
            F.lit('" data-idx="x" data-track="click:token;view:page" style="'
                  'color:#334; margin:0 1px">'),
            w,
            F.lit("&#32;<!-- t --><b>&amp;&quot;&lt;&gt;&#xa0;&ndash;"
                  "&hellip;&copy;</b>&#32;</span>"),
        ),
    )
    body = F.concat_ws("<!-- sep --><p class='s'>", marked)
    html = F.concat(
        F.lit("<html><head><title>doc </title>"
              "<style>.t{color:#333}</style>"
              "<script type='text/javascript'>var x=1;</script></head>"
              "<body><h1>Doc &amp; page</h1><p class='s'>"),
        body,
        F.lit("</p><!-- footer --><div id='f'>&copy; example</div>"
              "</body></html>"),
    )
    return base.select(
        "doc_id",
        F.concat(F.lit("https://example.org/doc/"), F.col("doc_id")).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
