"""Driver-local pure-Python oracle implementing gensim's documented semantics.

gensim itself cannot be imported in this container (no scipy), so correctness
tests compare the Spark plans against this independent reimplementation of the
published semantics (SURVEY.md §1.4, §2.3-2.5; formulas from
gensim/models/bm25model.py and gensim/corpora/dictionary.py), plus golden
values lifted from the reference's own test expectations (FIXTURES.md).
"""

from __future__ import annotations

import math
from collections import defaultdict


class PyDictionary:
    """gensim.corpora.Dictionary id-assignment + stats semantics."""

    def __init__(self, texts=None):
        self.token2id: dict[str, int] = {}
        self.dfs: dict[int, int] = {}
        self.cfs: dict[int, int] = {}
        self.num_docs = 0
        self.num_pos = 0
        self.num_nnz = 0
        if texts is not None:
            for doc in texts:
                self.doc2bow(doc, allow_update=True)

    def doc2bow(self, document, allow_update=False):
        counter = defaultdict(int)
        for w in document:
            counter[w] += 1
        if allow_update:
            # new tokens sorted lexicographically, ids = sequential counter
            for w, _ in sorted(counter.items()):
                if w not in self.token2id:
                    self.token2id[w] = len(self.token2id)
        result = {
            self.token2id[w]: f for w, f in counter.items() if w in self.token2id
        }
        if allow_update:
            self.num_docs += 1
            self.num_pos += sum(counter.values())
            self.num_nnz += len(result)
            for tid, f in result.items():
                self.cfs[tid] = self.cfs.get(tid, 0) + f
                self.dfs[tid] = self.dfs.get(tid, 0) + 1
        return sorted(result.items())

    def filter_extremes(self, no_below=5, no_above=0.5, keep_n=100000):
        no_above_abs = int(no_above * self.num_docs)
        good = [
            v for v in self.token2id.values()
            if no_below <= self.dfs.get(v, 0) <= no_above_abs
        ]
        good.sort(key=lambda v: self.dfs.get(v, 0), reverse=True)  # stable: id asc ties
        if keep_n is not None:
            good = good[:keep_n]
        keep = set(good)
        id2token = {v: k for k, v in self.token2id.items()}
        old_ids = sorted(keep)
        remap = {old: new for new, old in enumerate(old_ids)}
        self.token2id = {id2token[old]: new for old, new in remap.items()}
        self.dfs = {remap[o]: self.dfs[o] for o in old_ids}
        self.cfs = {remap[o]: self.cfs[o] for o in old_ids}
        return remap


def bm25_idfs(dfs: dict[int, int], num_docs: int, variant="okapi", epsilon=0.25):
    idfs = {}
    if variant == "okapi":
        for t, df in dfs.items():
            idfs[t] = math.log(num_docs - df + 0.5) - math.log(df + 0.5)
        avg = sum(idfs.values()) / len(idfs)
        eps = epsilon * avg
        for t, v in idfs.items():
            if v < 0:
                idfs[t] = eps
    elif variant == "lucene":
        for t, df in dfs.items():
            idfs[t] = math.log(num_docs + 1.0) - math.log(df + 0.5)
    elif variant == "atire":
        for t, df in dfs.items():
            idfs[t] = math.log(num_docs) - math.log(df)
    return idfs


class PyBM25:
    """Okapi/Lucene/Atire weighting, both fit paths (bm25model.py semantics)."""

    def __init__(self, variant="okapi", k1=1.5, b=0.75, epsilon=0.25,
                 dictionary: PyDictionary | None = None, corpus=None):
        self.variant, self.k1, self.b, self.epsilon = variant, k1, b, epsilon
        if dictionary is not None:
            num_tokens = sum(dictionary.cfs.values())
            self.avgdl = num_tokens / dictionary.num_docs
            self.idfs = bm25_idfs(dictionary.dfs, dictionary.num_docs, variant, epsilon)
        else:
            dfs: dict[int, int] = defaultdict(int)
            num_tokens = num_docs = 0
            for bow in corpus:
                num_tokens += len(bow)  # distinct terms — the reference quirk
                for tid in {t for t, _ in bow}:
                    dfs[tid] += 1
                num_docs += 1
            self.avgdl = num_tokens / num_docs
            self.idfs = bm25_idfs(dfs, num_docs, variant, epsilon)

    def weight(self, tid, tf, dl):
        idf = self.idfs.get(tid) or 0.0
        denom = tf + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
        num = tf * (self.k1 + 1) if self.variant in ("okapi", "atire") else tf
        return idf * (num / denom)

    def transform(self, bow):
        dl = sum(f for _, f in bow)
        return [(t, self.weight(t, f, dl)) for t, f in bow]


def py_topk(weighted_corpus, query_term_ids, k):
    """Disjunctive BM25 top-k with gensim clip semantics: score = Σ over query
    terms (binary weights); rank by |score| desc, doc_id asc; drop zeros."""
    q = set(query_term_ids)
    scores = []
    for doc_id, vec in enumerate(weighted_corpus):
        s = sum(w for t, w in vec if t in q)
        if s != 0.0:
            scores.append((doc_id, s))
    scores.sort(key=lambda p: (-abs(p[1]), p[0]))
    return scores[:k]
