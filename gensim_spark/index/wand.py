"""Block-max WAND top-k over packed shards — score-exact vs join-agg.

Semantics contract (SURVEY.md §7.0 item 8): pruning may only skip documents
provably unable to enter the current top-k; results must equal the exhaustive
``operators.topk.search`` plan in both ranks and scores. Gensim's ranking is
by |score| desc with exact zeros dropped and ties by ascending doc position
(gensim/interfaces.py:339-353, matutils.py:435-468) — BM25 weights are
non-negative in ordinary corpora, where |score| ≡ score and upper-bound
pruning is sound. If any weight is negative (the ε-clamp with a negative
mean idf — degenerate tiny-vocab corpora), WAND upper bounds are invalid, so
the traversal transparently falls back to exhaustive accumulation per shard
(still distributed; still exact).

Execution shape: parquet scan pruned to the query's term_ids (predicate
pushdown into the shard files) → ``applyInPandas`` per shard computing the
shard-local top-k with block-max skipping → global TakeOrdered merge.
Per-query cost is dominated by the pruned scan: only the query terms' runs
are ever read (the CSC column-slice insight, docsim.py:1289, made physical).

References: Broder et al., CIKM'03 (WAND); Ding & Suel, SIGIR'11 (block-max).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gensim_spark.index import packing
from gensim_spark.index.layout import read_packed_shards

LOCAL_TOPK_SCHEMA = "query_id int, doc_id long, score double"


def _exhaustive(term_runs, k):
    """Fallback: accumulate all postings of the query terms (dict-based)."""
    acc: dict[int, float] = {}
    for docs, weights, qw in term_runs:
        for d, w in zip(docs.tolist(), (weights.astype(np.float64) * qw).tolist()):
            acc[d] = acc.get(d, 0.0) + w
    items = [(d, s) for d, s in acc.items() if s != 0.0]
    items.sort(key=lambda p: (-abs(p[1]), p[0]))
    return items[:k]


def _wand(term_runs, k, block_size=packing.BLOCK_SIZE):
    """Block-max WAND over one shard's runs for one query.

    term_runs: list of (doc_ids int64[], weights float32[], q_weight float,
    block_max float32[], block_last_doc int64[]).
    Returns [(doc_id, score)] — the shard-local top-k by (score desc, doc asc).
    """
    if any((w < 0).any() for _, w, _, _, _ in term_runs):
        return _exhaustive([(d, w, q) for d, w, q, _, _ in term_runs], k)

    class T:
        __slots__ = ("docs", "w", "qw", "pos", "n", "ub", "bmax", "blast")

        def __init__(self, docs, w, qw, bmax, blast):
            self.docs, self.w, self.qw = docs, w, qw
            self.pos, self.n = 0, len(docs)
            self.bmax, self.blast = bmax, blast
            self.ub = float(qw * bmax.max()) if len(bmax) else 0.0

        def cur(self):
            return self.docs[self.pos] if self.pos < self.n else None

        def advance_to(self, d):
            # gallop via searchsorted on the remaining slice
            self.pos += int(np.searchsorted(self.docs[self.pos:], d, "left"))

        def block_ub(self):
            b = self.pos // block_size
            return float(self.qw * self.bmax[b])

        def block_last(self):
            b = self.pos // block_size
            return int(self.blast[b])

    terms = [T(d, w, q, bm, bl) for d, w, q, bm, bl in term_runs if len(d)]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap on score

    def threshold():
        if len(heap) < k:
            return 0.0  # scores are > 0; zero-score docs are dropped anyway
        return heap[0][0]

    def push(doc, score):
        if score <= 0.0:
            return
        if len(heap) < k:
            heapq.heappush(heap, (score, -doc))
        elif (score, -doc) > heap[0]:
            heapq.heapreplace(heap, (score, -doc))

    while True:
        live = [t for t in terms if t.pos < t.n]
        if not live:
            break
        live.sort(key=lambda t: t.docs[t.pos])
        # pivot: first term where cumulative global upper bound can beat θ
        th = threshold()
        acc = 0.0
        pivot_i = None
        for i, t in enumerate(live):
            acc += t.ub
            if acc > th or (len(heap) < k and acc > 0.0):
                pivot_i = i
                break
        if pivot_i is None:
            break  # no doc can enter the top-k
        pivot_doc = int(live[pivot_i].docs[live[pivot_i].pos])
        # block-max refinement: tighter bound from the current blocks
        block_acc = sum(t.block_ub() for t in live[: pivot_i + 1])
        if len(heap) >= k and block_acc <= th:
            # no doc covered only by the pivot prefix can qualify up to the
            # earliest block boundary; cap the jump at the next later term's
            # current doc (docs beyond it gain that term's contribution).
            # Jump only if it makes progress — when the cap lands on the
            # current min doc (a later term tied at the pivot), fall through
            # to the standard evaluate/advance step instead.
            boundary = min(t.block_last() for t in live[: pivot_i + 1])
            nxt = boundary + 1
            if pivot_i + 1 < len(live):
                nxt = min(nxt, int(live[pivot_i + 1].docs[live[pivot_i + 1].pos]))
            if nxt > int(live[0].docs[live[0].pos]):
                for t in live[: pivot_i + 1]:
                    t.advance_to(nxt)
                continue
        if int(live[0].docs[live[0].pos]) == pivot_doc:
            # fully evaluate pivot_doc
            score = 0.0
            for t in live:
                if t.pos >= t.n:
                    continue
                d = int(t.docs[t.pos])
                if d == pivot_doc:
                    score += float(t.qw) * float(t.w[t.pos])
                    t.pos += 1
                elif d > pivot_doc:
                    break
            push(pivot_doc, score)
        else:
            # advance the preceding terms to the pivot
            for t in live[:pivot_i]:
                t.advance_to(pivot_doc)
    out = sorted(((-d, s) for s, d in heap), key=lambda p: (-p[1], p[0]))
    return [(d, s) for d, s in out]


def _shard_topk_factory(query_terms: dict[int, dict[int, float]], k: int):
    """query_terms: {query_id: {term_id: q_weight}}."""

    def shard_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        runs_by_term = {}
        for _, r in pdf.iterrows():
            docs = packing.decode_varint_deltas(bytes(r["doc_blob"]))
            weights = np.frombuffer(bytes(r["weight_blob"]), dtype=np.float32)
            bmax = np.frombuffer(bytes(r["block_max"]), dtype=np.float32)
            blast = np.frombuffer(bytes(r["block_last_doc"]), dtype=np.int64)
            runs_by_term[int(r["term_id"])] = (docs, weights, bmax, blast)
        for qid, terms in query_terms.items():
            runs = []
            for tid, qw in terms.items():
                if tid in runs_by_term:
                    d, w, bm, bl = runs_by_term[tid]
                    runs.append((d, w, float(qw), bm, bl))
            if not runs:
                continue
            for doc, score in _wand(runs, k):
                rows.append((qid, doc, score))
        return pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])

    return shard_topk


def wand_topk(spark: SparkSession, index_dir: str,
              query_terms: dict[int, dict[int, float]], k: int = 10,
              packed: DataFrame | None = None) -> DataFrame:
    """Distributed block-max WAND: (query_id, doc_id, score, rank).

    Reads only the query terms' packed runs (partition/row-group pruning),
    computes per-shard local top-k, merges with the standard two-stage
    TakeOrdered (per-shard k lists → global k, ≙ docsim.py:236-257 merge).
    """
    all_terms = sorted({int(t) for q in query_terms.values() for t in q})
    if packed is None:
        packed = read_packed_shards(spark, index_dir)
    pruned = packed.filter(F.col("term_id").isin(all_terms))
    local = pruned.groupBy("shard_id").applyInPandas(
        _shard_topk_factory(query_terms, k), schema=LOCAL_TOPK_SCHEMA
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.abs(F.col("score")).desc(), F.col("doc_id").asc()
    )
    return (
        local.filter(F.col("score") != 0.0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
