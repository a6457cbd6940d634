"""Corpus-curation operators: PII redaction, benchmark decontamination,
deterministic split assignment, per-domain stats.

Training-data-pipeline surface (not in the gensim reference): the
corpus-level hygiene passes a 100 TB Common-Crawl-style build runs between
extraction and indexing/training. Everything here is either a narrow
JVM-side projection (regexp expressions — whole-stage codegen, zero
shuffle, runs at scan speed) or a broadcast join against a tiny benchmark
set, so no operator introduces a corpus-sized shuffle.

Engine-portability note: the regexes below deliberately stay inside the
common subset of Java ``java.util.regex`` (Spark) and RE2 (DuckDB) —
ASCII ``\\d``, ``\\b``, bounded repetition, simple alternation — so the
DuckDB oracles replay them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gensim_spark.operators.dedup import gram_hashes, shingles

# Portable PII patterns (Java regex == RE2 semantics for these).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# international +NNNNNNN (7-14 digits) or NANP-style NNN-NNN-NNNN
PHONE_RE = r"\+\d{7,14}|\b\d{3}-\d{3}-\d{4}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ipv4, clean_text): count PII matches
    on the raw text, then redact with typed sentinels.

    Counts are over the raw text per pattern (independent, deterministic);
    redaction applies email → phone → IPv4 in that fixed order so nested
    matches (digits inside an already-redacted email) cannot double-fire.
    Pure JVM ``regexp_count``/``regexp_replace`` projection — zero shuffle,
    scan speed at any corpus size.
    """
    from gensim_spark.functions.scanwidth import widen_if_narrow

    docs = widen_if_narrow(docs)  # regex scrub of a 1-split input: 1 task
    # null-safe: a crawl row with no extracted text scrubs to "" with zero
    # counts instead of propagating nulls into every output column
    t = F.coalesce(F.col(text_col), F.lit(""))
    clean = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PHONE_RE, "<PHONE>")
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("int").alias("n_ipv4"),
        clean.alias("clean_text"),
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  tokens_col: str = "tokens", n: int = 13,
                  doc_col: str = "doc_id",
                  broadcast_benchmark: bool = True,
                  hashed: bool = False) -> DataFrame:
    """(doc_id, n_hits, contaminated): flag corpus documents sharing any
    token n-gram with a benchmark/eval set (GPT-3-style train-test
    decontamination; n=13 is the published choice for web corpora).

    ``n_hits`` counts the *distinct* document n-grams found in the
    benchmark's n-gram set. Benchmark suites are tiny next to the corpus,
    so the gram set is broadcast (hash-map probe per doc gram, zero
    shuffle of corpus data); pass ``broadcast_benchmark=False`` to fall
    back to a shuffle equijoin if the benchmark is genuinely large.
    Every doc keeps a row (n_hits=0, contaminated=false when clean) so the
    output is a full keep/drop mask.

    ``hashed=True`` is the scale path: grams are probed as 64-bit
    rotate-xor hashes of per-token xxhash64 values (``dedup.gram_hashes``)
    instead of concatenated strings, so the pass never allocates per-gram
    strings — the allocation that dominates the exact path's wall at
    10^8+ grams (measured: BASELINE.md round-4 curation table). Semantics
    are identical up to 64-bit collisions (~2^-64 per gram pair, i.e. a
    handful of false ``n_hits`` per 10^18 probes); the exact string path
    stays the default and the oracle target.
    """
    # corpus grams are deduped PER ROW (array_distinct before the explode —
    # zero exchanges), so the broadcast probe sees each doc-gram once and the
    # per-doc hit count is a plain count, not a countDistinct: the distinct
    # semantics ride the row-local array, never a corpus-gram-sized shuffle
    if hashed:
        gram_col = "gram_hash"
        doc_grams = gram_hashes(docs, tokens_col, n, doc_col, distinct="row")
        bench_grams = (gram_hashes(benchmark, tokens_col, n, doc_col)
                       .select(gram_col).distinct())
    else:
        gram_col = "shingle"
        doc_grams = shingles(docs, tokens_col, n, doc_col, distinct="row")
        bench_grams = (shingles(benchmark, tokens_col, n, doc_col)
                       .select(gram_col).distinct())
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    hits = (doc_grams.join(bench_grams, gram_col)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (
        docs.select(F.col(doc_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _hex_threshold(frac_cum: float) -> str:
    """Cumulative fraction → 4-hex-digit threshold string. Lowercase hex of
    fixed width compares lexicographically == numerically in both Spark and
    DuckDB (ASCII '0'-'9' < 'a'-'f'), so the split is engine-portable."""
    return format(min(int(frac_cum * 65536), 65535), "04x")


def split_assign(docs: DataFrame, key_col: str = "doc_id",
                 fractions=(("train", 0.90), ("val", 0.05), ("test", 0.05)),
                 salt: str = "") -> DataFrame:
    """(doc_id, bucket_hex, split): deterministic, engine-portable
    train/val/test assignment — the first 4 hex chars of
    ``md5(salt || key)`` thresholded by cumulative fractions.

    Stable across runs, cluster sizes, and partitionings (pure projection,
    zero shuffle), and reproducible by any engine with md5 — the property
    a training-data split must have so re-runs never leak val docs into
    train. ``salt`` derives independent re-splits from the same keys.
    """
    fracs = list(fractions)
    if not fracs or abs(sum(f for _, f in fracs) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {fracs}")
    key = F.col(key_col).cast("string")
    if salt:
        key = F.concat(F.lit(salt), key)
    bucket = F.substring(F.md5(key), 1, 4)
    cum = 0.0
    expr = None
    for name, frac in fracs[:-1]:
        cum += frac
        cond = bucket < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(fracs[-1][0])
    split = last if expr is None else expr.otherwise(last)
    return docs.select(
        F.col(key_col).alias("doc_id"),
        bucket.alias("bucket_hex"),
        split.alias("split"),
    )


def chunk_tokens(docs: DataFrame, tokens_col: str = "tokens",
                 size: int = 512, stride: int | None = None,
                 doc_col: str = "doc_id",
                 drop_last_shorter_than: int = 0) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk): fixed-size token windows with
    optional overlap — the context-length packing step between curation and
    tokenizer/training. ``stride`` defaults to ``size`` (non-overlapping);
    ``stride < size`` overlaps windows. The final window may be short;
    ``drop_last_shorter_than`` discards tails below a minimum.

    Pure per-row array expressions (sequence/slice/posexplode) — zero
    shuffle, scan speed, embarrassingly parallel at any corpus size. The
    chunk is emitted re-joined as a string column so downstream sinks never
    carry nested arrays unless they want to re-split.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    toks = F.col(tokens_col)
    # window starts: 0, stride, 2*stride, ... < len(tokens); empty docs → none
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, size))
    out = (
        docs.select(F.col(doc_col).alias("doc_id"),
                    F.posexplode(chunks).alias("chunk_id", "_chunk"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size("_chunk").alias("n_tokens"),
            F.concat_ws(" ", F.col("_chunk")).alias("chunk"),
        )
    )
    if drop_last_shorter_than > 0:
        out = out.filter(F.col("n_tokens") >= drop_last_shorter_than)
    return out


def domain_stats(docs: DataFrame, domain_col: str = "source",
                 text_col: str = "text",
                 doc_col: str = "doc_id") -> DataFrame:
    """(domain, n_docs, total_chars, mean_chars, distinct_texts, dup_frac):
    per-domain curation stats — the signal domain-level filters (spam
    domains, mirror farms) cut on.

    One map-side-combined hash aggregation keyed by domain; the md5
    fingerprint stands in for the text in the distinct-count so the
    shuffle never carries document bodies.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))  # null text == empty text
    fp = F.md5(text)
    n = F.count(F.lit(1))
    nd = F.countDistinct(F.col("_fp"))
    return (
        docs.select(F.col(domain_col).alias("domain"),
                    F.length(text).alias("_len"),
                    fp.alias("_fp"))
        .groupBy("domain")
        .agg(
            n.alias("n_docs"),
            F.sum("_len").cast("long").alias("total_chars"),
            F.round(F.avg("_len"), 6).alias("mean_chars"),
            nd.alias("distinct_texts"),
            F.round((n - nd).cast("double") / n, 6).alias("dup_frac"),
        )
    )
