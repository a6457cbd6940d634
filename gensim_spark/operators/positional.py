"""Positional postings + exact phrase queries over the inverted index.

gensim's retrieval surface has no phrase operator; this extends the graft's
north-star index (posting-list construction → intersection-style querying,
SURVEY §2.5) with the canonical next capability of an inverted index:
token positions recorded at build time, exact-adjacency phrase matching at
query time, and Lucene-style phrase scoring — the phrase behaves as a
pseudo-term whose tf is the phrase occurrence count and whose idf is the
SUM of the member terms' idfs (org.apache.lucene.search.PhraseQuery /
PhraseWeight semantics; scoring saturation reuses the fitted BM25Stats
variant so a phrase and a term are comparable under one model).

Plans (100 TB shape):
- **build**: ONE groupBy((doc_id, term_id)) over the posexploded tokens —
  the same single shuffle ``doc2bow_postings`` pays; positions ride along
  as a sorted int array per posting row (postings get wider, the plan
  does not change). Salting/bucketed-store layouts apply unchanged.
- **query**: one scan leg per phrase term, each pruned to its term_id at
  the source (predicate pushdown on the term-bucketed store), inner-joined
  on doc_id — only docs containing ALL member terms survive, which is the
  classic intersection-driven phrase plan. The adjacency check is a pure
  JVM array fold: starts = ∩ᵢ (positionsᵢ − i) via
  ``array_intersect``/``transform`` — zero Python UDFs, zero shuffles
  beyond the k-way join on the intersection-sized frames.
- **storage**: the positional frame persists through the SAME
  ``layout.write_postings_bucketed`` store as plain postings (the
  positions column rides along; bucket partition pruning + term_id
  row-group pushdown apply unchanged) — pass the pruned
  ``read_postings_bucketed(..., term_ids=phrase_ids)`` frame straight
  into :func:`phrase_occurrences` / :func:`phrase_topk`
  (tests/test_positional.py::test_phrase_over_stored_bucketed_index).
  In-session frames work too but re-derive the positional groupBy per
  term leg (with the term filter pushed below it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import BM25Stats


def positional_postings(docs: DataFrame, vocab: DataFrame,
                        doc_col: str = "doc_id", tokens_col: str = "tokens",
                        broadcast_vocab: bool = True) -> DataFrame:
    """docs(doc_id, tokens) ⋈ vocab → (doc_id, term_id, positions, tf).

    ``positions`` is the sorted int array of 0-based token offsets;
    ``tf == size(positions)`` so the frame is a drop-in superset of
    ``doc2bow_postings`` output (same single shuffle, same join)."""
    rows = docs.select(doc_col, F.posexplode(tokens_col).alias("pos", "token"))
    v = vocab.select("token", "term_id")
    if broadcast_vocab:
        v = F.broadcast(v)
    return (rows.join(v, "token")
            .groupBy(doc_col, "term_id")
            .agg(F.sort_array(F.collect_list("pos")).alias("positions"),
                 F.count(F.lit(1)).alias("tf")))


def phrase_occurrences(positional: DataFrame, phrase_term_ids,
                       doc_col: str = "doc_id") -> DataFrame:
    """Docs containing the EXACT phrase (adjacent, in order):
    (doc_id, starts, phrase_tf) with phrase_tf ≥ 1.

    starts = ∩ᵢ (positions of termᵢ shifted left by i) — a doc position s
    survives iff term₀ is at s, term₁ at s+1, … Duplicate terms in the
    phrase are legal (each occurrence becomes its own shifted leg)."""
    ids = [int(t) for t in phrase_term_ids]
    if not ids:
        raise ValueError("empty phrase")
    def shift_left(off: int):
        # one-arg lambda, NOT `lambda p, i=i`: F.transform inspects arity
        # and would pass the ARRAY INDEX as the second argument
        return F.transform("positions", lambda p: p - F.lit(off))

    legs = []
    for i, tid in enumerate(ids):
        shifted = F.col("positions") if i == 0 else shift_left(i)
        legs.append(positional.filter(F.col("term_id") == tid)
                    .select(F.col(doc_col), shifted.alias(f"_s{i}")))
    j = legs[0]
    for leg in legs[1:]:
        j = j.join(leg, doc_col)
    starts = F.col("_s0")
    for i in range(1, len(ids)):
        starts = F.array_intersect(starts, F.col(f"_s{i}"))
    return (j.select(doc_col, starts.alias("starts"))
            .withColumn("phrase_tf", F.size("starts"))
            .filter(F.col("phrase_tf") > 0))


def multi_phrase_occurrences(positional: DataFrame, alternatives,
                             doc_col: str = "doc_id") -> DataFrame:
    """MultiPhrase match (Lucene MultiPhraseQuery): ``alternatives`` is a
    list of term-id lists — position i of the phrase matches ANY of
    ``alternatives[i]`` (e.g. ``[[a], [b, c]]`` ≙ "a (b|c)"). Returns
    (doc_id, starts, phrase_tf), phrase_tf ≥ 1.

    Each leg unions its alternative terms' position arrays per doc
    (flatten + array_distinct after the same term-pruned scan a plain
    phrase leg does — the scan prunes to the leg's term set, so each leg
    stays intersection-shaped); adjacency is the identical shifted
    array-intersect fold as :func:`phrase_occurrences`."""
    alts = [[int(t) for t in a] for a in alternatives]
    if not alts or any(not a for a in alts):
        raise ValueError("each phrase position needs ≥1 alternative term")

    legs = []
    for i, tids in enumerate(alts):
        leg = (positional.filter(F.col("term_id").isin(tids))
               .groupBy(doc_col)
               .agg(F.array_sort(F.array_distinct(
                   F.flatten(F.collect_list("positions")))).alias("_m")))
        shifted = (F.col("_m") if i == 0 else
                   F.transform("_m", lambda p: p - F.lit(i)))
        legs.append(leg.select(F.col(doc_col), shifted.alias(f"_s{i}")))
    j = legs[0]
    for leg in legs[1:]:
        j = j.join(leg, doc_col)
    starts = F.col("_s0")
    for i in range(1, len(alts)):
        starts = F.array_intersect(starts, F.col(f"_s{i}"))
    return (j.select(doc_col, starts.alias("starts"))
            .withColumn("phrase_tf", F.size("starts"))
            .filter(F.col("phrase_tf") > 0))


def multi_phrase_topk(positional: DataFrame, stats: BM25Stats, alternatives,
                      dl: DataFrame, k: int = 10,
                      doc_col: str = "doc_id") -> DataFrame:
    """Top-k docs for a MultiPhrase query. Scoring follows Lucene
    MultiPhraseWeight: the pseudo-term idf is the sum over ALL member
    terms in all positions (each alternative contributes — Lucene's
    idfExplain over the flattened term array), saturation from the fitted
    BM25Stats as in :func:`phrase_topk`."""
    alts = [[int(t) for t in a] for a in alternatives]
    occ = multi_phrase_occurrences(positional, alts, doc_col)
    flat = [t for a in alts for t in a]
    idf_map = {r["term_id"]: r["idf"] for r in stats.idfs.filter(
        F.col("term_id").isin(sorted(set(flat)))).collect()}
    idf_sum = float(sum(idf_map.get(t, 0.0) for t in flat))
    tf = F.col("phrase_tf").cast("double")
    dlc = F.col("dl").cast("double")
    denom = tf + F.lit(stats.k1) * (F.lit(1.0 - stats.b)
                                    + F.lit(stats.b) * dlc / F.lit(stats.avgdl))
    num = (tf * F.lit(stats.k1 + 1.0) if stats.variant in ("okapi", "atire")
           else tf)
    scored = (occ.join(dl, doc_col)
              .select(doc_col, "phrase_tf",
                      (F.lit(idf_sum) * num / denom).alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc(doc_col)).limit(k)
    from pyspark.sql import Window

    wnd = Window.orderBy(F.desc("score"), F.asc(doc_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(doc_col, "phrase_tf", "score", "rank"))


def near_occurrences(positional: DataFrame, term_a: int, term_b: int,
                     slop: int = 1, ordered: bool = True,
                     doc_col: str = "doc_id") -> DataFrame:
    """Two-term proximity (SpanNear / ``"a NEAR/k b"``): docs where term_b
    occurs within ``slop`` intervening tokens of term_a —
    ordered: 0 < pos_b − pos_a ≤ slop + 1 (slop=0 ≡ exact adjacency);
    unordered: 1 ≤ |pos_b − pos_a| ≤ slop + 1. Returns
    (doc_id, near_tf) where near_tf counts the term_a anchor positions
    with a qualifying partner — a pure JVM array fold (filter + exists),
    no Python UDF, no extra shuffle."""
    a = (positional.filter(F.col("term_id") == int(term_a))
         .select(F.col(doc_col), F.col("positions").alias("_pa")))
    b = (positional.filter(F.col("term_id") == int(term_b))
         .select(F.col(doc_col), F.col("positions").alias("_pb")))
    w = F.lit(int(slop) + 1)
    if ordered:
        def near(p):
            return F.exists("_pb", lambda q: (q > p) & (q - p <= w))
    else:
        def near(p):
            return F.exists("_pb",
                            lambda q: (q != p) & (F.abs(q - p) <= w))
    anchors = F.filter("_pa", lambda p: near(p))
    return (a.join(b, doc_col)
            .select(doc_col, F.size(anchors).alias("near_tf"))
            .filter(F.col("near_tf") > 0))


def near_topk(positional: DataFrame, stats: BM25Stats, term_a: int,
              term_b: int, dl: DataFrame, slop: int = 1,
              ordered: bool = True, k: int = 10,
              doc_col: str = "doc_id") -> DataFrame:
    """Top-k docs for a NEAR query — same pseudo-term scoring as
    :func:`phrase_topk` (tf = near_tf, idf = idf_a + idf_b, the fitted
    stats' saturation). (doc_id, near_tf, score, rank)."""
    occ = near_occurrences(positional, term_a, term_b, slop, ordered, doc_col)
    idf_map = {r["term_id"]: r["idf"] for r in stats.idfs.filter(
        F.col("term_id").isin([int(term_a), int(term_b)])).collect()}
    idf_sum = float(idf_map.get(int(term_a), 0.0)
                    + idf_map.get(int(term_b), 0.0))
    tf = F.col("near_tf").cast("double")
    dlc = F.col("dl").cast("double")
    denom = tf + F.lit(stats.k1) * (F.lit(1.0 - stats.b)
                                    + F.lit(stats.b) * dlc / F.lit(stats.avgdl))
    num = (tf * F.lit(stats.k1 + 1.0) if stats.variant in ("okapi", "atire")
           else tf)
    scored = (occ.join(dl, doc_col)
              .select(doc_col, "near_tf",
                      (F.lit(idf_sum) * num / denom).alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc(doc_col)).limit(k)
    from pyspark.sql import Window

    wnd = Window.orderBy(F.desc("score"), F.asc(doc_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(doc_col, "near_tf", "score", "rank"))


def span_first_topk(positional: DataFrame, stats: BM25Stats, term_id: int,
                    end: int, dl: DataFrame, k: int = 10,
                    doc_col: str = "doc_id") -> DataFrame:
    """Span-first query (Lucene SpanFirstQuery): the term must occur
    within the first ``end`` token positions (0-based: position < end) —
    "mentions X in the opening" queries. tf counts only the qualifying
    occurrences (a JVM array filter over the positional postings — the
    scan prunes to the term's postings, the fold is per-row); scoring is
    the same pseudo-term model as :func:`phrase_topk` with the term's own
    idf. Returns (doc_id, first_tf, score, rank)."""
    if end < 1:
        raise ValueError("end must be ≥ 1")
    e = F.lit(int(end))
    occ = (positional.filter(F.col("term_id") == int(term_id))
           .select(F.col(doc_col),
                   F.size(F.filter("positions", lambda p: p < e))
                   .alias("first_tf"))
           .filter(F.col("first_tf") > 0))
    idf_rows = stats.idfs.filter(F.col("term_id") == int(term_id)).collect()
    idf = float(idf_rows[0]["idf"]) if idf_rows else 0.0
    tf = F.col("first_tf").cast("double")
    dlc = F.col("dl").cast("double")
    denom = tf + F.lit(stats.k1) * (F.lit(1.0 - stats.b)
                                    + F.lit(stats.b) * dlc / F.lit(stats.avgdl))
    num = (tf * F.lit(stats.k1 + 1.0) if stats.variant in ("okapi", "atire")
           else tf)
    scored = (occ.join(dl, doc_col)
              .select(doc_col, "first_tf",
                      (F.lit(idf) * num / denom).alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc(doc_col)).limit(k)
    from pyspark.sql import Window

    wnd = Window.orderBy(F.desc("score"), F.asc(doc_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(doc_col, "first_tf", "score", "rank"))


def phrase_topk(positional: DataFrame, stats: BM25Stats, phrase_term_ids,
                dl: DataFrame, k: int = 10,
                doc_col: str = "doc_id") -> DataFrame:
    """Top-k docs for an exact phrase, Lucene PhraseQuery scoring:
    score = (Σᵢ idf(termᵢ)) · S(phrase_tf, dl) where S is the fitted
    stats' saturation (same k1/b/avgdl/variant as term queries, so phrase
    and term scores live on one scale). Returns
    (doc_id, phrase_tf, score, rank) — TakeOrdered (orderBy + limit), not
    a global window."""
    ids = [int(t) for t in phrase_term_ids]
    occ = phrase_occurrences(positional, ids, doc_col)
    # phrase idf = sum over member OCCURRENCES (duplicates count twice,
    # Lucene PhraseWeight). k values — an inputs-only collect.
    idf_map = {r["term_id"]: r["idf"] for r in
               stats.idfs.filter(F.col("term_id").isin(ids)).collect()}
    idf_sum = float(sum(idf_map.get(t, 0.0) for t in ids))
    tf = F.col("phrase_tf").cast("double")
    dlc = F.col("dl").cast("double")
    denom = tf + F.lit(stats.k1) * (F.lit(1.0 - stats.b)
                                    + F.lit(stats.b) * dlc / F.lit(stats.avgdl))
    num = (tf * F.lit(stats.k1 + 1.0) if stats.variant in ("okapi", "atire")
           else tf)
    scored = (occ.join(dl, doc_col)
              .select(doc_col, "phrase_tf",
                      (F.lit(idf_sum) * num / denom).alias("score")))
    top = scored.orderBy(F.desc("score"), F.asc(doc_col)).limit(k)
    from pyspark.sql import Window

    wnd = Window.orderBy(F.desc("score"), F.asc(doc_col))
    return (top.withColumn("rank", F.row_number().over(wnd))
            .select(doc_col, "phrase_tf", "score", "rank"))


def phrase_text_topk(spark, docs: DataFrame, vocab: DataFrame,
                     stats: BM25Stats, phrase_tokens, dl: DataFrame,
                     k: int = 10) -> DataFrame:
    """Convenience: phrase given as token strings; OOV member → no match
    (inner vocab probe, the dictionary.doc2bow drop semantics)."""
    vmap = {r["token"]: r["term_id"] for r in
            vocab.filter(F.col("token").isin(list(phrase_tokens)))
            .select("token", "term_id").collect()}
    if any(t not in vmap for t in phrase_tokens):
        from .bow import doc2bow_postings  # noqa: F401  (schema parity)
        return spark.createDataFrame(
            [], "doc_id long, phrase_tf int, score double, rank int")
    pos = positional_postings(docs, vocab)
    return phrase_topk(pos, stats, [vmap[t] for t in phrase_tokens], dl, k=k)
