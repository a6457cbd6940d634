"""Byte-pair-encoding tokenizer: distributed word histogram + pair-count
analytics, a vocab-bounded driver merge loop, and Arrow-batched encode.

Spark-first split of the algorithm (Sennrich et al. 2016,
arXiv:1508.07909, the scheme GPT-2-family LLM data pipelines descend
from; no counterpart in the reference repo — gensim's Dictionary keeps
words whole):

- The ONLY corpus-sized work is (1) the word-histogram shuffle — one
  map-side-combined ``groupBy(word).count`` — and (2) encode, an
  embarrassingly parallel pandas UDF over broadcast merge ranks with
  per-batch word memoization. 100 TB of text funnels into a
  distinct-word histogram that is vocab-bounded (Heaps' law), the same
  driver memory model as Dictionary / KeyedVectors (api.py
  MAX_DRIVER_VOCAB) — and the histogram is all BPE training ever needs.
- The merge loop is inherently sequential (merge i+1's pair counts
  depend on merge i), so it runs where the histogram fits, with indexed
  incremental pair-count maintenance: each merge touches only the words
  that contain the chosen pair, not the whole vocabulary.
- ``pair_counts`` exposes the first merge round as a pure relational
  plan (chars → adjacent pairs → weighted hash-agg), the
  independently-checkable slice of training.

Word form is the canonical learn_bpe one: ``(c1, .., c_{n-1},
c_n + '</w>')`` — the end-of-word marker rides the last character.
"""
from __future__ import annotations

import json
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["word_histogram", "pair_counts", "bpe_train", "BpeModel",
           "encode_word", "MAX_DRIVER_TYPES"]

# driver-residency guard, same contract as api.Dictionary.MAX_DRIVER_VOCAB:
# distinct word TYPES (not corpus tokens) must fit on the driver to train
MAX_DRIVER_TYPES = 20_000_000


def word_histogram(tokens_df: DataFrame, tokens_col: str = "tokens",
                   min_count: int = 1) -> DataFrame:
    """(word, cnt) distinct-word histogram — the one corpus-sized shuffle
    of BPE training (map-side combined, carries one row per TYPE out of
    each task)."""
    out = (tokens_df.select(F.explode(tokens_col).alias("word"))
           .groupBy("word").agg(F.count("*").alias("cnt")))
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def _symbols_expr(word_col: str = "word"):
    """Canonical BPE word form as a column: chars, last char + '</w>'.
    ``sequence`` is DESCENDING when start > stop, so the single-char case
    is branched, never sliced."""
    w = F.col(word_col)
    tail = F.array(F.concat(F.substring(w, -1, 1), F.lit("</w>")))
    heads = F.expr(f"transform(sequence(1, length({word_col}) - 1), "
                   f"i -> substring({word_col}, i, 1))")
    return (F.when(F.length(w) <= 1, tail)
            .otherwise(F.concat(heads, tail)))


def pair_counts(words: DataFrame, word_col: str = "word",
                cnt_col: str = "cnt") -> DataFrame:
    """Adjacent-symbol pair counts over the histogram — BPE's first merge
    round as a relational plan: (left, right, cnt), cnt summed over word
    frequencies. Zero shuffle until the final vocab-sized hash-agg."""
    syms = words.select(F.col(cnt_col).alias("cnt"),
                        _symbols_expr(word_col).alias("s"))
    pairs = syms.select(
        "cnt",
        F.explode(F.when(
            F.size("s") >= 2,
            F.expr("transform(sequence(1, size(s) - 1), "
                   "i -> struct(s[i-1] AS left, s[i] AS right))")
        ).otherwise(F.array())).alias("p"))
    return (pairs.select(F.col("p.left").alias("left"),
                         F.col("p.right").alias("right"), "cnt")
            .groupBy("left", "right").agg(F.sum("cnt").alias("cnt")))


# --- driver-side training over the collected histogram -----------------------

def _word_syms(word: str) -> tuple:
    if len(word) <= 1:
        return (word + "</w>",)
    return tuple(word[:-1]) + (word[-1] + "</w>",)


def _merge_syms(syms: tuple, pair: tuple) -> tuple:
    """Replace adjacent ``pair`` occurrences left-to-right with the fused
    symbol (overlaps resolve leftmost-first: aaa + (a,a) -> (aa, a))."""
    fused = pair[0] + pair[1]
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(fused)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(words, num_merges: int, min_pair_count: int = 2,
              collected: bool = False) -> "BpeModel":
    """Learn ``num_merges`` merges from a (word, cnt) histogram DataFrame
    (or a pre-collected ``{word: cnt}`` when ``collected=True``).

    Deterministic tie-break: highest count, then lexicographically
    smallest pair — invariant to partitioning because the loop runs over
    the collected histogram. Stops early when the best pair's count drops
    below ``min_pair_count`` (learn_bpe's min-frequency contract).

    Incremental bookkeeping: pair counts and a pair→words inverted index
    are maintained per merge, so each round costs O(words containing the
    chosen pair), not O(|histogram|)."""
    if collected:
        items = list(words.items())
    else:
        # persist: the guard count and the collect otherwise re-run the
        # corpus-sized histogram shuffle twice (the histogram itself is
        # vocab-bounded, cheap to hold)
        words = words.persist()
        try:
            n = words.count()
            if n > MAX_DRIVER_TYPES:
                raise ValueError(
                    f"histogram has {n} distinct types > MAX_DRIVER_TYPES"
                    f" ({MAX_DRIVER_TYPES}); raise min_count in"
                    " word_histogram or the cap")
            items = [(r["word"], int(r["cnt"])) for r in words.collect()]
        finally:
            words.unpersist()
    # canonical iteration order so index-set iteration can't leak
    # collection nondeterminism into equal-count re-segmentations
    items.sort()
    syms = [_word_syms(w) for w, _ in items]
    cnts = [c for _, c in items]

    counts: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for wi, s in enumerate(syms):
        c = cnts[wi]
        for p in zip(s, s[1:]):
            counts[p] += c
            index[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None or best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        for wi in sorted(index[pair]):
            old = syms[wi]
            new = _merge_syms(old, pair)
            c = cnts[wi]
            for p in zip(old, old[1:]):
                counts[p] -= c
                index[p].discard(wi)
            for p in zip(new, new[1:]):
                counts[p] += c
                index[p].add(wi)
            syms[wi] = new
        # the merged pair is gone from every word that contained it
        counts.pop(pair, None)
        index.pop(pair, None)
    return BpeModel(merges)


def encode_word(word: str, ranks: dict) -> list[str]:
    """Iteratively fuse the present pair with the LOWEST merge rank
    (GPT-2's encoder loop — provably equivalent to replaying merges in
    training order, pinned by test parity). Unknown characters survive as
    single symbols."""
    s = _word_syms(word)
    while len(s) >= 2:
        best = None
        for p in zip(s, s[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        s = _merge_syms(s, best[1])
    return list(s)


class BpeModel:
    """Learned merge list + rank map; distributed encode via a broadcast
    of the ranks and a per-batch word memo (Zipf: a handful of types
    dominate every batch, so most tokens hit the memo)."""

    def __init__(self, merges: list[tuple[str, str]],
                 meta: dict | None = None):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {p: i for i, p in enumerate(self.merges)}
        self.meta = dict(meta or {})
        self._bc = None
        self._bc_sc = None

    # -- persistence (tiny, model-sized json) ---------------------------------
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"merges": [list(m) for m in self.merges],
                       "meta": self.meta}, f)

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        with open(path, encoding="utf-8") as f:
            raw = json.load(f)
        if isinstance(raw, list):  # early bare-list format
            return cls([tuple(m) for m in raw])
        return cls([tuple(m) for m in raw["merges"]], raw.get("meta"))

    def encode_word(self, word: str) -> list[str]:
        return encode_word(word, self.ranks)

    def encode(self, tokens_df: DataFrame, tokens_col: str = "tokens",
               out_col: str = "bpe_tokens") -> DataFrame:
        """Append ``out_col``: the concatenated BPE pieces of every word
        in ``tokens_col``. Arrow-batched, zero shuffle, merge table ships
        once per executor via broadcast."""
        spark = tokens_df.sparkSession
        sc = spark.sparkContext
        # memoize the broadcast per context: repeated encode() calls must
        # not accumulate a fresh executor-resident copy of the merge table
        if self._bc is None or self._bc_sc is not sc:
            self._bc = sc.broadcast(self.ranks)
            self._bc_sc = sc
        bc = self._bc

        @F.pandas_udf(ArrayType(StringType()))
        def enc(col: pd.Series) -> pd.Series:
            ranks = bc.value
            memo: dict = {}

            def one(words):
                out = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        memo[w] = got
                    out.extend(got)
                return out

            return col.apply(one)

        return tokens_df.withColumn(out_col, enc(F.col(tokens_col)))
