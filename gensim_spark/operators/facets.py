"""Faceted search — per-field value counts and numeric range histograms
over a query's match set (Lucene facets / drill-down sidebars).

gensim's retrieval surface stops at ranked doc ids; every production
fulltext engine also answers "how do the matches distribute over
category X?". Semantics follow Lucene's FacetsCollector reduced to its
relational core: the facet input is the MATCH SET (any frame carrying
doc_id — a full score frame or a top-k clip), counts are per distinct
field value, ranges are fixed-width histogram buckets.

Plan (100 TB shape): one broadcast/shuffle semi-join of the documents
table against the match-set ids (match-set-sized, never corpus-sized when
the query is selective), then ONE hash aggregation per facet — map-side
combined by Spark, output rows bounded by field cardinality. No
collect, no window, no explode."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(docs_meta: DataFrame, matches: DataFrame, field: str,
                 top: int | None = None,
                 doc_col: str = "doc_id",
                 keep_nulls: bool = False) -> DataFrame:
    """(value, count) over the match set, count desc / value asc; ``top``
    clips to the n most frequent values (the drill-down sidebar length).
    ``matches`` only needs a ``doc_col`` column — pass a score frame or a
    top-k result as-is; duplicate ids (multi-query frames) are collapsed
    so a doc counts once. Docs with a NULL facet value are skipped, as
    Lucene's FacetsCollector skips documents missing the facet field;
    ``keep_nulls=True`` counts them as a NULL-valued sidebar row
    instead."""
    ids = matches.select(doc_col).distinct()
    joined = docs_meta.join(ids, doc_col, "left_semi")
    if not keep_nulls:
        joined = joined.filter(F.col(field).isNotNull())
    out = (joined.groupBy(F.col(field).alias("value"))
           .agg(F.count(F.lit(1)).alias("count"))
           .orderBy(F.desc("count"), F.asc("value")))
    if top is not None:
        out = out.limit(top)
    return out


def facet_ranges(docs_meta: DataFrame, matches: DataFrame, field: str,
                 lo: float, width: float, n_buckets: int,
                 doc_col: str = "doc_id") -> DataFrame:
    """Fixed-width numeric histogram over the match set:
    (bucket, lo, hi, count) for buckets [lo + i·width, lo + (i+1)·width);
    values outside [lo, lo + n·width) clamp into the edge buckets
    (Lucene LongRange facets with closed outer edges). Empty buckets are
    emitted with count 0 — a histogram keeps its axis."""
    if width <= 0 or n_buckets < 1:
        raise ValueError("width > 0 and n_buckets >= 1 required")
    ids = matches.select(doc_col).distinct()
    joined = docs_meta.join(ids, doc_col, "left_semi")
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col(field) - lo) / width)),
    ).cast("int")
    counts = (joined.select(bucket.alias("bucket"))
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("count")))
    spark = docs_meta.sparkSession
    axis = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (F.lit(lo) + F.col("id") * width).cast("double").alias("lo"),
        (F.lit(lo) + (F.col("id") + 1) * width).cast("double").alias("hi"))
    return (axis.join(counts, "bucket", "left")
            .select("bucket", "lo", "hi",
                    F.coalesce("count", F.lit(0)).alias("count"))
            .orderBy("bucket"))
