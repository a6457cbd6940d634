"""Deduplication operators for large-scale training-data pipelines.

Not part of the gensim reference surface — these are the web-scale corpus
hygiene operators a 10^12-document indexing pipeline needs before vocabulary
build (exact dup removal, MinHash/LSH and SimHash near-dup detection, n-gram
Jaccard verification, embedding-cosine near-dup).

All hash-derived values use :func:`gensim_spark.functions.hashing.hash60`
(md5-based) so every stage is bit-for-bit oracle-checkable in ANSI SQL.

Scale notes:
- exact dedup = one hash-agg shuffle on a 16-byte digest (group key is the
  digest, never the text).
- MinHash: signatures are a narrow per-doc aggregation (shuffle on doc_id —
  or none if shingles are computed per-row from the tokens array, which is
  what ``minhash_signatures`` does: zero shuffles until the band join).
  Candidate generation shuffles on (band_id, band_hash) — bucket sizes are
  the skew hazard; cap with ``max_bucket`` (drops degenerate buckets, e.g.
  boilerplate pages, exactly like production near-dup pipelines do).
- SimHash: per-doc bit-vote aggregation, no pairwise work at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gensim_spark.functions.hashing import hash60, seeded


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, text_hash, keep): keep=True for the smallest doc_id per
    identical-text group — the canonical survivor."""
    h = docs.select(F.col(doc_col).alias("doc_id"),
                    F.md5(F.col(text_col).cast("string")).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return h.withColumn("keep", F.col("doc_id") == F.min("doc_id").over(w))


def shingles(docs: DataFrame, tokens_col: str = "tokens", n: int = 3,
             doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle): distinct n-gram token shingles, built per-row from
    the tokens array with zero shuffles (no posexplode + window needed)."""
    toks = F.col(tokens_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        docs.select(F.col(doc_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame, tokens_col: str = "tokens",
                       num_hashes: int = 8, shingle_n: int = 3,
                       doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, sig_0 … sig_{H-1}): per-doc MinHash signature — min over
    shingles of a seeded hash, one aggregation per hash function."""
    sh = shingles(docs, tokens_col, shingle_n, doc_col)
    aggs = [
        F.min(seeded(F.col("shingle"), h)).alias(f"sig_{h}")
        for h in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_pairs(signatures: DataFrame, bands: int = 4,
                       rows_per_band: int = 2,
                       max_bucket: int = 1000) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band. (doc_a, doc_b), doc_a<doc_b.

    band_hash = hash of the band's signature slice. Buckets larger than
    ``max_bucket`` are dropped (boilerplate guard — at web scale a single
    "404 page" bucket would otherwise quadratically explode the self-join).
    """
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}").cast("string")
                 for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"),
                     hash60(F.concat_ws("_", *parts)).alias("band_hash"))
        )
    banded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_hash")
        banded = (
            banded.withColumn("_sz", F.count(F.lit(1)).over(w))
            .filter(F.col("_sz") <= max_bucket)
            .drop("_sz")
        )
    a = banded.select("band_id", "band_hash", F.col("doc_id").alias("doc_a"))
    b = banded.select("band_id", "band_hash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, tokens_col: str = "tokens",
                  shingle_n: int = 3, doc_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify stage after
    LSH): (doc_a, doc_b, jaccard)."""
    sh = shingles(docs, tokens_col, shingle_n, doc_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
            .alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, tokens_col: str = "tokens", bits: int = 16,
            doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): weighted bit-vote fingerprint. Each distinct token
    votes ±tf on each of ``bits`` bits of its hash60; bit set iff vote > 0."""
    tf = (
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.explode(tokens_col).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("th", hash60(F.col("token")))
    )
    votes = (
        tf.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
            "tf", "th",
        )
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(th, bit)").bitwiseAND(1) == 1,
                   F.col("tf")).otherwise(-F.col("tf")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0))
        ).alias("simhash")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup pairs above threshold — BRUTE-FORCE half
    self-join. O(N²): test-oracle / small-corpus only. The scale path is
    :func:`embedding_near_dups_lsh` (bucket-equijoin, no cartesian)."""
    from gensim_spark.operators.simsearch import cosine_expr

    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                cosine_expr(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dups_lsh(embeddings: DataFrame, threshold: float = 0.95,
                            planes: int = 6, dims: int = 64,
                            max_bucket: int | None = 100_000,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-random-projection LSH — the
    100 TB path: candidates are restricted to equal-bucket vectors
    (bucket-equijoin, shuffle on a long key, NO cartesian product), then
    verified with the exact JVM-side cosine. Misses only cross-bucket pairs
    (recall dial = ``planes``; fewer planes → bigger buckets → higher
    recall). ``max_bucket`` drops degenerate buckets (e.g. all-zero junk
    embeddings) that would otherwise blow up quadratically — same boilerplate
    guard as :func:`minhash_band_pairs`."""
    from gensim_spark.operators.simsearch import cosine_expr, lsh_buckets

    b = lsh_buckets(embeddings, planes, dims, id_col, vec_col)
    e = embeddings.join(b, embeddings[id_col] == b.vec_id).select(
        b.vec_id, F.col(vec_col).alias("_v"), "bucket"
    )
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        e = (
            e.withColumn("_sz", F.count(F.lit(1)).over(w))
            .filter(F.col("_sz") <= max_bucket)
            .drop("_sz")
        )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("_v").alias("va"),
                 "bucket")
    bb = e.select(F.col("vec_id").alias("id_b"), F.col("_v").alias("vb"),
                  "bucket")
    return (
        a.join(bb, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                cosine_expr(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
