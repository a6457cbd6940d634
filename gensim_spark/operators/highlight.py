"""Snippet extraction / hit highlighting — the presentation stage of a
fulltext engine (Lucene UnifiedHighlighter's best-passage selection).

gensim has no highlighter; the graft's index answers top-k doc_ids, and a
search UI needs the "why": the best window of the document around the query
hits. Semantics follow Lucene's passage scoring reduced to its core: among
candidate windows of fixed token width anchored at a query-term hit, pick
the one covering the most DISTINCT query terms; ties break to the earliest
window (Lucene prefers earlier passages at equal score).

Plan (100 TB shape): everything is a per-row JVM array fold over the
already-tokenized docs — ``transform``/``filter``/``exists``/``slice`` with
the query set inlined as a literal array. Zero shuffles, zero Python UDFs,
no explode: the doc row never leaves its partition, so this composes with
any top-k result by a doc_id semi-join (intersection-sized)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def best_snippets(docs: DataFrame, query_tokens, width: int = 8,
                  mark: bool = False,
                  doc_col: str = "doc_id",
                  tokens_col: str = "tokens") -> DataFrame:
    """docs(doc_id, tokens) → (doc_id, start, n_terms, snippet) for docs
    with ≥1 hit: ``start`` = 0-based token offset of the best window,
    ``n_terms`` = distinct query terms inside it, ``snippet`` = the window's
    tokens joined by spaces (``mark=True`` wraps each hit in ``<b>…</b>``,
    the highlighter's default tag pair).

    Candidate windows are anchored at hit positions — the classic
    highlighter reduction: a window containing any hit is dominated by one
    *starting* at a hit (shifting left to the previous hit never drops a
    term), so anchoring at hits loses no optimum while keeping the fold
    O(hits²) per doc instead of O(len·hits)."""
    q = sorted(set(query_tokens))
    if not q:
        raise ValueError("empty query")
    if width < 1:
        raise ValueError("width must be ≥ 1")
    qarr = F.array(*[F.lit(t) for t in q])
    w = F.lit(int(width))

    # (idx, token) structs of the query hits — one indexed transform + filter
    hits = F.filter(
        F.transform(tokens_col, lambda t, i: F.struct(i.alias("idx"),
                                                      t.alias("tok"))),
        lambda s: F.array_contains(qarr, s["tok"]))
    out = docs.withColumn("_hits", hits).filter(F.size("_hits") > 0)

    def win_count(s: Column) -> Column:
        # distinct query terms inside [s, s+width)
        inwin = F.filter("_hits", lambda h: (h["idx"] >= s)
                         & (h["idx"] < s + w))
        return F.size(F.array_distinct(
            F.transform(inwin, lambda h: h["tok"])))

    # argmax by (count desc, start asc) via struct ordering: max of
    # (count, -start) — struct comparison is lexicographic by field
    best = F.array_max(F.transform(
        "_hits", lambda h: F.struct(win_count(h["idx"]).alias("cnt"),
                                    (-h["idx"]).alias("negs"))))
    out = (out.withColumn("_best", best)
           .withColumn("start", -F.col("_best")["negs"])
           .withColumn("n_terms", F.col("_best")["cnt"]))
    window = F.slice(tokens_col, F.col("start") + 1, w)
    if mark:
        window = F.transform(
            window,
            lambda t: F.when(F.array_contains(qarr, t),
                             F.concat(F.lit("<b>"), t, F.lit("</b>")))
            .otherwise(t))
    return (out.withColumn("snippet", F.concat_ws(" ", window))
            .select(doc_col, "start", "n_terms", "snippet"))


def highlight_topk(docs: DataFrame, topk: DataFrame, query_tokens,
                   width: int = 8, mark: bool = True,
                   doc_col: str = "doc_id",
                   tokens_col: str = "tokens") -> DataFrame:
    """Join a top-k result (doc_id, score, rank, …) with its best snippet:
    the search-results page in one plan. The semi-join prunes the snippet
    fold to the k result docs BEFORE any array work runs (broadcast-sized
    right side), so snippet cost is O(k), not corpus-sized.

    The top-k frame is referenced twice in the final plan (once broadcast
    for the prune, once as the join's left side); without materialization
    the whole scoring subtree executes once per reference (measured: the
    full snippet query cost ~3.4x the underlying search). ``topk`` results
    are k-sized per query, so an eager ``localCheckpoint`` pins them once
    and truncates the plan."""
    topk = topk.localCheckpoint(eager=True)
    pruned = docs.join(F.broadcast(topk.select(doc_col)), doc_col, "left_semi")
    snips = best_snippets(pruned, query_tokens, width=width, mark=mark,
                          doc_col=doc_col, tokens_col=tokens_col)
    return topk.join(snips, doc_col, "left")
