"""Positional postings + exact phrase matching + Lucene-style phrase scoring."""
import math

import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import bm25 as M
from gensim_spark.operators import bow as B
from gensim_spark.operators import positional as PX
from gensim_spark.operators import vocab as V

TEXTS = [
    ["a", "b", "c", "a", "b"],   # d0: "a b" at 0 and 3; "a b c" at 0
    ["b", "a", "b"],             # d1: "a b" at 1
    ["c", "c", "a"],             # d2: no "a b"
    ["a", "a", "a"],             # d3: "a a" at 0, 1
]


@pytest.fixture(scope="module")
def fixture(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs).cache()
    vmap = {r["token"]: r["term_id"] for r in vocab.collect()}
    pos = PX.positional_postings(docs, vocab).cache()
    return docs, vocab, vmap, pos


def starts_of(pos, ids):
    return {r["doc_id"]: sorted(r["starts"])
            for r in PX.phrase_occurrences(pos, ids).collect()}


def test_positional_postings_superset_of_doc2bow(spark, fixture):
    docs, vocab, vmap, pos = fixture
    rows = pos.collect()
    assert all(sorted(r["positions"]) == list(r["positions"]) for r in rows)
    assert all(r["tf"] == len(r["positions"]) for r in rows)
    bow = {(r["doc_id"], r["term_id"]): r["tf"]
           for r in B.doc2bow_postings(docs, vocab).collect()}
    assert {(r["doc_id"], r["term_id"]): r["tf"] for r in rows} == bow


def test_phrase_occurrence_goldens(fixture):
    _, _, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    assert starts_of(pos, [a, b]) == {0: [0, 3], 1: [1]}
    assert starts_of(pos, [b, c]) == {0: [1]}
    assert starts_of(pos, [c, a]) == {0: [2], 2: [1]}
    assert starts_of(pos, [b, a]) == {1: [0]}


def test_phrase_triple_and_duplicates(fixture):
    _, _, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    assert starts_of(pos, [a, b, c]) == {0: [0]}
    assert starts_of(pos, [a, a]) == {3: [0, 1]}
    assert starts_of(pos, [c, c]) == {2: [0]}
    assert starts_of(pos, [b, b]) == {}


def test_single_term_phrase_equals_postings(fixture):
    _, _, vmap, pos = fixture
    a = vmap["a"]
    got = starts_of(pos, [a])
    want = {r["doc_id"]: sorted(r["positions"])
            for r in pos.filter(F.col("term_id") == a).collect()}
    assert got == want


def test_phrase_topk_scoring_lucene_semantics(spark, fixture):
    docs, vocab, vmap, pos = fixture
    a, b = vmap["a"], vmap["b"]
    stats = M.fit_from_vocab(vocab, num_docs=len(TEXTS), variant="lucene")
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    out = PX.phrase_topk(pos, stats, [a, b], dl, k=10).collect()
    assert [r["doc_id"] for r in out] == [0, 1]
    assert [r["rank"] for r in out] == [1, 2]
    # hand-compute: lucene idf = ln(N+1) - ln(df+0.5); N=4, df_a=4 (a is in
    # d0/d1/d2/d3), df_b=2
    idf_sum = (math.log(5.0) - math.log(4.5)) + (math.log(5.0) - math.log(2.5))
    avgdl = sum(len(t) for t in TEXTS) / len(TEXTS)
    for r, (ptf, dlen) in zip(out, [(2, 5), (1, 3)]):
        denom = ptf + 1.5 * (0.25 + 0.75 * dlen / avgdl)
        assert r["phrase_tf"] == ptf
        assert r["score"] == pytest.approx(idf_sum * ptf / denom, rel=1e-12)


def near_of(pos, a, b, slop, ordered=True):
    return {r["doc_id"]: r["near_tf"] for r in
            PX.near_occurrences(pos, a, b, slop=slop,
                                ordered=ordered).collect()}


def test_near_goldens(fixture):
    _, _, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    # d0 = [a b c a b]: a@{0,3}, b@{1,4}, c@{2}
    # ordered a NEAR/0 b == exact adjacency anchors
    assert near_of(pos, a, b, slop=0) == {0: 2, 1: 1}
    # a NEAR/1 c ordered: a@0 → c@2 within 2 ✓; a@3 → no c after
    assert near_of(pos, a, c, slop=1) == {0: 1}
    # ordered c→a: c@2 → a@3 ✓ in d0; d2 = [c c a]: c@0 (a@2 within 2) and
    # c@1 (a@2) → 2 anchors
    assert near_of(pos, c, a, slop=1) == {0: 1, 2: 2}
    # unordered: b NEAR/0 a picks up both adjacent pairs in d0 (b@1-a@0 is
    # reverse order) and d1 = [b a b] both b anchors
    assert near_of(pos, b, a, slop=0, ordered=False) == {0: 2, 1: 2}
    # ordered b→a with slop 0: only d1's b@0 → a@1
    assert near_of(pos, b, a, slop=0) == {1: 1}


def test_near_fuzz_vs_bruteforce(spark):
    import random

    rng = random.Random(77)
    alphabet = ["aa", "bb", "cc"]
    for trial in range(20):
        texts = [[rng.choice(alphabet) for _ in range(rng.randint(1, 10))]
                 for _ in range(rng.randint(1, 6))]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, tokens array<string>")
        vocab = V.build_vocab(docs)
        vmap = {r["token"]: r["term_id"] for r in vocab.collect()}
        ta, tb = rng.sample(alphabet, 2)
        if ta not in vmap or tb not in vmap:
            continue
        slop = rng.randint(0, 3)
        ordered = rng.random() < 0.5
        pos = PX.positional_postings(docs, vocab)
        got = near_of(pos, vmap[ta], vmap[tb], slop, ordered)
        want = {}
        for did, toks in enumerate(texts):
            pa = [i for i, t in enumerate(toks) if t == ta]
            pb = [i for i, t in enumerate(toks) if t == tb]
            n = sum(1 for p in pa if any(
                (0 < q - p <= slop + 1) if ordered
                else (q != p and abs(q - p) <= slop + 1) for q in pb))
            if n:
                want[did] = n
        assert got == want, (trial, ta, tb, slop, ordered, texts)


def span_of(pos, ids, slop, ordered=True):
    return {r["doc_id"]: r["near_tf"]
            for r in PX.span_near_occurrences(pos, ids, slop=slop,
                                              ordered=ordered).collect()}


def _brute_span_ordered(toks, clause, slop):
    """Naive scan: anchors p0 with a strictly increasing greedy chain whose
    stretch (end − start + 1 − n) stays ≤ slop."""
    n = len(clause)
    P = [[i for i, t in enumerate(toks) if t == c] for c in clause]
    cnt = 0
    for p0 in P[0]:
        e, ok = p0, True
        for i in range(1, n):
            nxt = [q for q in P[i] if q > e]
            if not nxt:
                ok = False
                break
            e = min(nxt)
        if ok and e - p0 <= slop + n - 1:
            cnt += 1
    return cnt


def _brute_span_unordered(toks, clause, slop):
    from collections import Counter

    n, mult = len(clause), Counter(clause)
    P = {t: [i for i, tk in enumerate(toks) if tk == t] for t in mult}
    union = sorted({q for ps in P.values() for q in ps})
    win = slop + n
    return sum(1 for s in union
               if all(len([q for q in P[t] if s <= q < s + win]) >= m
                      for t, m in mult.items()))


def test_span_near_goldens(fixture):
    _, _, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    # d0 = [a b c a b]: "a b c"~0 == exact triple at 0 (stretch 0)
    assert span_of(pos, [a, b, c], slop=0) == {0: 1}
    # "a c b"~1: a@0 → c@2 → b@4, stretch 4+1-3 = 2 > 1: no match
    assert span_of(pos, [a, c, b], slop=1) == {}
    # "a c b"~2: the chain above fits; anchor a@3 has no c after
    assert span_of(pos, [a, c, b], slop=2) == {0: 1}
    # duplicate clause: "a a a"~0 only d3 = [a a a]
    assert span_of(pos, [a, a, a], slop=0) == {3: 1}
    # unordered n=3 window cover: {a,b,c} within width 3 — d0 windows
    # starting at 0 ([a b c]), 1 ([b c a]) and 2 ([c a b]) qualify;
    # a@3's window [3,6) = [a b] has no c
    assert span_of(pos, [a, b, c], slop=0, ordered=False) == {0: 3}
    # unordered n=2 delegates to near_occurrences (anchor-partner
    # semantics): every a in d3 = [a a a] has a distinct partner within 2
    assert span_of(pos, [a, a], slop=1, ordered=False) == \
        near_of(pos, a, a, slop=1, ordered=False) == {3: 3}
    # unordered n≥3 with duplicate clauses needs that many DISTINCT
    # positions in the window: {a,a,b} width 4 — only d0's window at 0
    # ([a b c a]) holds two a's and a b
    assert span_of(pos, [a, a, b], slop=1, ordered=False) == {0: 1}


def test_span_near_two_term_parity(fixture):
    """n=2 ordered SpanNear must reduce exactly to near_occurrences."""
    _, _, vmap, pos = fixture
    a, b = vmap["a"], vmap["b"]
    for slop in (0, 1, 3):
        assert span_of(pos, [a, b], slop=slop) == near_of(pos, a, b, slop)
        # unordered n=2 delegates outright
        assert span_of(pos, [a, b], slop=slop, ordered=False) == \
            near_of(pos, a, b, slop, ordered=False)


def test_span_near_fuzz_vs_bruteforce(spark):
    import random

    rng = random.Random(4242)
    alphabet = ["aa", "bb", "cc", "dd", "ee"]
    texts = [[rng.choice(alphabet) for _ in range(rng.randint(3, 30))]
             for _ in range(50)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs)
    vmap = {r["token"]: r["term_id"] for r in vocab.collect()}
    pos = PX.positional_postings(docs, vocab).cache()
    cases = [(["aa", "bb", "cc"], 0, True), (["aa", "bb", "cc"], 2, True),
             (["aa", "bb", "cc", "dd"], 3, True), (["aa", "aa", "bb"], 1, True),
             (["ee", "cc"], 2, True), (["aa", "bb", "cc"], 2, False),
             (["aa", "bb", "cc", "dd"], 4, False), (["aa", "aa", "cc"], 2, False)]
    for clause, slop, ordered in cases:
        got = span_of(pos, [vmap[c] for c in clause], slop, ordered)
        brute = _brute_span_ordered if ordered else _brute_span_unordered
        want = {i: brute(t, clause, slop) for i, t in enumerate(texts)}
        want = {i: c for i, c in want.items() if c > 0}
        assert got == want, (clause, slop, ordered)


def test_span_near_or_clauses(spark, fixture):
    """OR-clauses (spanNear over spanOr alternatives): clause position
    sets union their members; goldens + slop=0 ≡ exact MultiPhrase +
    fuzz vs a naive union-chain scan."""
    docs, vocab, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    # d0=[a b c a b]: a then (b|c) adjacent at 0 and 3; d1=[b a b] at 1
    assert span_of(pos, [[a], [b, c]], slop=0) == {0: 2, 1: 1}
    # wider slop: a then (b|c) within stretch 2 — d2=[c c a] has no b/c
    # after a; d0 both anchors already matched at stretch 1
    assert span_of(pos, [[a], [b, c]], slop=1) == {0: 2, 1: 1}
    # (a|c) then (a|c): d0 c@2→a@3 ✓ a@3→? none(>3 in {2}∪{0,3})✗ →1;
    # d2 [c c a]: c@0→c@1, c@1→a@2 ✓✓, a@2 ✗ → 2; d3 [a a a]: 2
    assert span_of(pos, [[a, c], [a, c]], slop=0) == {0: 1, 2: 2, 3: 2}
    # slop=0 OR-chain ≡ exact MultiPhrase occurrence counts
    for alts in ([[a], [b, c]], [[b, a], [b]], [[a, c], [a, c]]):
        exact = {r["doc_id"]: r["phrase_tf"] for r in
                 PX.multi_phrase_occurrences(pos, alts).collect()}
        assert span_of(pos, alts, slop=0) == exact, alts
    # multi_phrase_topk(slop=) routes through the span fold
    stats = M.fit_from_vocab(vocab, num_docs=len(TEXTS), variant="lucene")
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    via_mp = PX.multi_phrase_topk(pos, stats, [[a], [b, c]], dl, k=10,
                                  slop=1).collect()
    via_span = PX.span_near_topk(pos, stats, [[a], [b, c]], dl, slop=1,
                                 k=10).collect()
    assert [(r["doc_id"], r["phrase_tf"], r["score"]) for r in via_mp] == \
        [(r["doc_id"], r["near_tf"], r["score"]) for r in via_span]
    # validation: OR-clauses are ordered-only; empty clause refuses
    with pytest.raises(ValueError):
        PX.span_near_occurrences(pos, [[a, b], [c]], slop=1, ordered=False)
    with pytest.raises(ValueError):
        PX.span_near_occurrences(pos, [[a], []], slop=1)


def _brute_span_or(toks, clauses, slop):
    """Naive union-chain scan for OR-clause ordered SpanNear."""
    P = [[i for i, t in enumerate(toks) if t in set(c)] for c in clauses]
    n, cnt = len(clauses), 0
    for p0 in P[0]:
        e, ok = p0, True
        for i in range(1, n):
            nxt = [q for q in P[i] if q > e]
            if not nxt:
                ok = False
                break
            e = min(nxt)
        if ok and e - p0 <= slop + n - 1:
            cnt += 1
    return cnt


def test_span_near_or_fuzz_vs_bruteforce(spark):
    import random

    rng = random.Random(31337)
    alphabet = ["aa", "bb", "cc", "dd", "ee"]
    texts = [[rng.choice(alphabet) for _ in range(rng.randint(3, 30))]
             for _ in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs)
    vmap = {r["token"]: r["term_id"] for r in vocab.collect()}
    pos = PX.positional_postings(docs, vocab).cache()
    cases = [([["aa"], ["bb", "cc"]], 0), ([["aa"], ["bb", "cc"]], 2),
             ([["aa", "bb"], ["cc"], ["dd", "ee"]], 2),
             ([["aa", "bb"], ["aa", "bb"]], 1),
             ([["ee"], ["aa", "bb", "cc", "dd"]], 3)]
    for clauses, slop in cases:
        got = span_of(pos, [[vmap[w] for w in c] for c in clauses], slop)
        want = {i: _brute_span_or(t, clauses, slop)
                for i, t in enumerate(texts)}
        want = {i: c for i, c in want.items() if c > 0}
        assert got == want, (clauses, slop)


def test_span_not_goldens_and_fuzz(spark, fixture):
    """SpanNot (include span minus excluded-term windows): goldens on the
    fixture + brute-force fuzz on random corpora."""
    docs, vocab, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]

    def notof(ids, ex, slop=0, pre=0, post=0):
        return {r["doc_id"]: r["near_tf"]
                for r in PX.span_not_occurrences(pos, ids, ex, slop=slop,
                                                 pre=pre,
                                                 post=post).collect()}

    # single-term include "a NOT c"±1: d0 a@0 ok / a@3 blocked by c@2;
    # d1 a@1 (no c); d2 a@2 blocked by c@1; d3 all three a's
    assert notof([a], [c], pre=1, post=1) == {0: 1, 1: 1, 3: 3}
    # ordered span include [a b]~0, exclude c in [start, end+1]:
    # d0 a@0-b@1 blocked (c@2), a@3-b@4 clean; d1 a@1-b@2 clean
    assert notof([a, b], [c], slop=0, post=1) == {0: 1, 1: 1}
    # no exclusion occurrences at all -> pure span counts
    assert notof([a, b], [vmap["d"]] if "d" in vmap else [9999]) == \
        {r["doc_id"]: r["near_tf"] for r in PX.span_near_occurrences(
            pos, [a, b], slop=0).collect()}
    # validation
    with pytest.raises(ValueError):
        PX.span_not_occurrences(pos, [a, b], [])
    with pytest.raises(ValueError):
        PX.span_not_occurrences(pos, [a], [b], pre=-1)

    # fuzz vs brute force
    import random

    rng = random.Random(991)
    alphabet = ["aa", "bb", "cc", "dd", "ee"]
    texts = [[rng.choice(alphabet) for _ in range(rng.randint(3, 25))]
             for _ in range(40)]
    fdocs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    fvocab = V.build_vocab(fdocs)
    fmap = {r["token"]: r["term_id"] for r in fvocab.collect()}
    fpos = PX.positional_postings(fdocs, fvocab).cache()

    def brute(toks, clauses, ex, slop, pre, post):
        P = [[i for i, t in enumerate(toks) if t in set(cl)]
             for cl in clauses]
        E = [i for i, t in enumerate(toks) if t in set(ex)]
        cnt = 0
        for p0 in P[0]:
            e, ok = p0, True
            for i in range(1, len(clauses)):
                nxt = [q for q in P[i] if q > e]
                if not nxt:
                    ok = False
                    break
                e = min(nxt)
            if ok and e - p0 <= slop + len(clauses) - 1 and \
                    not any(p0 - pre <= q <= e + post for q in E):
                cnt += 1
        return cnt

    cases = [([["aa"]], ["bb"], 0, 1, 1),
             ([["aa"], ["bb"]], ["cc"], 1, 0, 0),
             ([["aa"], ["bb", "cc"]], ["dd"], 2, 1, 2),
             ([["aa"], ["bb"], ["cc"]], ["ee"], 3, 0, 1)]
    for clauses, ex, slop, pre, post in cases:
        ids = [[fmap[w] for w in cl] for cl in clauses]
        got = {r["doc_id"]: r["near_tf"]
               for r in PX.span_not_occurrences(
                   fpos, ids, [fmap[w] for w in ex], slop=slop, pre=pre,
                   post=post).collect()}
        want = {i: brute(t, clauses, ex, slop, pre, post)
                for i, t in enumerate(texts)}
        want = {i: n for i, n in want.items() if n > 0}
        assert got == want, (clauses, ex, slop, pre, post)


def test_span_near_topk_and_sloppy_phrase(spark, fixture):
    docs, vocab, vmap, pos = fixture
    a, c, b = vmap["a"], vmap["c"], vmap["b"]
    stats = M.fit_from_vocab(vocab, num_docs=len(TEXTS), variant="lucene")
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    out = PX.span_near_topk(pos, stats, [a, c, b], dl, slop=2, k=10).collect()
    assert [(r["doc_id"], r["near_tf"], r["rank"]) for r in out] == [(0, 1, 1)]
    # score = (idf_a + idf_c + idf_b) · saturation(tf=1, dl=5)
    idfs = {r["term_id"]: r["idf"] for r in stats.idfs.collect()}
    isum = idfs[a] + idfs[c] + idfs[b]
    denom = 1.0 + stats.k1 * (1.0 - stats.b + stats.b * 5.0 / stats.avgdl)
    assert out[0]["score"] == pytest.approx(isum * 1.0 / denom, rel=1e-12)
    # phrase_topk(slop=) routes through the ordered span fold
    via_phrase = PX.phrase_topk(pos, stats, [a, c, b], dl, k=10,
                                slop=2).collect()
    assert [(r["doc_id"], r["phrase_tf"], r["score"]) for r in via_phrase] \
        == [(r["doc_id"], r["near_tf"], r["score"]) for r in out]
    # slop=0 ordered span == exact phrase occurrence counts
    for ids in ([a, b], [a, b, c], [a, a]):
        exact = {r["doc_id"]: r["phrase_tf"]
                 for r in PX.phrase_occurrences(pos, ids).collect()}
        assert span_of(pos, ids, slop=0) == exact
    # argument validation
    with pytest.raises(ValueError):
        PX.span_near_occurrences(pos, [a], slop=1)
    with pytest.raises(ValueError):
        PX.span_near_occurrences(pos, [a, b], slop=-1)


def test_phrase_fuzz_vs_bruteforce(spark):
    # 30 random corpora × random phrases vs a naive python scan
    import random

    rng = random.Random(1234)
    alphabet = ["aa", "bb", "cc", "dd"]
    for trial in range(30):
        texts = [[rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
                 for _ in range(rng.randint(1, 8))]
        texts = [t for t in texts if t] or [["aa"]]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, tokens array<string>")
        vocab = V.build_vocab(docs)
        vmap = {r["token"]: r["term_id"] for r in vocab.collect()}
        klen = rng.randint(1, 3)
        phrase = [rng.choice(alphabet) for _ in range(klen)]
        if any(p not in vmap for p in phrase):
            continue
        pos = PX.positional_postings(docs, vocab)
        got = {r["doc_id"]: sorted(r["starts"]) for r in
               PX.phrase_occurrences(pos, [vmap[p] for p in phrase]).collect()}
        want = {}
        for did, toks in enumerate(texts):
            s = [i for i in range(len(toks) - klen + 1)
                 if toks[i:i + klen] == phrase]
            if s:
                want[did] = s
        assert got == want, (trial, phrase, texts)


def test_phrase_over_stored_bucketed_index(spark, fixture, tmp_path):
    # the 100 TB shape: positional postings persisted through the SAME
    # term-bucketed store as plain postings (positions column rides along),
    # phrase query runs over the term-pruned scan — identical answers, and
    # the plan shows bucket partition pruning + term_id pushdown
    from gensim_spark.index import layout

    docs, vocab, vmap, pos = fixture
    store = str(tmp_path / "pos_store")
    layout.write_postings_bucketed(pos, store, n_buckets=4)
    a, b = vmap["a"], vmap["b"]
    pruned = layout.read_postings_bucketed(spark, store, term_ids=[a, b],
                                           n_buckets=4)
    got = {r["doc_id"]: sorted(r["starts"])
           for r in PX.phrase_occurrences(pruned, [a, b]).collect()}
    want = {r["doc_id"]: sorted(r["starts"])
            for r in PX.phrase_occurrences(pos, [a, b]).collect()}
    assert got == want == {0: [0, 3], 1: [1]}
    plan = (PX.phrase_occurrences(pruned, [a, b])
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "term_id" in plan


def test_phrase_text_topk_and_oov(spark, fixture):
    docs, vocab, vmap, pos = fixture
    stats = M.fit_from_vocab(vocab, num_docs=len(TEXTS))
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    out = PX.phrase_text_topk(spark, docs, vocab, stats, ["a", "b"], dl, k=5)
    # okapi on this tiny corpus: idf('a') is ε-clamped NEGATIVE (df==N)
    # so idf_sum < 0 and the higher-saturation doc ranks LOWER — the
    # documented gensim negative-idf quirk, phrase scoring inherits it
    assert [r["doc_id"] for r in out.collect()] == [1, 0]
    empty = PX.phrase_text_topk(spark, docs, vocab, stats,
                                ["a", "zzz"], dl, k=5)
    assert empty.count() == 0


def test_prefix_topk_expansion(spark):
    from gensim_spark.operators import topk as T

    texts = [["aa", "ab", "bb"], ["aa", "bb"], ["bb"]]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs)
    stats = M.fit_from_vocab(vocab, num_docs=3, variant="lucene")
    postings = B.doc2bow_postings(docs, vocab)
    weighted = M.weight_postings(postings, stats)
    out = T.prefix_topk(weighted, vocab, "a", k=10).collect()
    # expansion {aa, ab}: d2 has neither -> dropped; manual sums match
    w = {(r["doc_id"], r["term_id"]): r["weight"] for r in weighted.collect()}
    ids = {r["token"]: r["term_id"] for r in vocab.collect()}
    expect = {0: w[(0, ids["aa"])] + w[(0, ids["ab"])],
              1: w[(1, ids["aa"])]}
    got = {r["doc_id"]: r["score"] for r in out}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], rel=1e-12)
    ranks = {r["doc_id"]: r["rank"] for r in out}
    order = sorted(expect, key=lambda d: (-abs(expect[d]), d))
    assert [d for d, _ in sorted(ranks.items(), key=lambda x: x[1])] == order


def test_bool_topk_semantics(spark):
    from gensim_spark.operators import topk as T

    texts = [["aa", "bb", "cc"],        # has must aa, should bb, NOT cc
             ["aa", "bb"],              # must + should, clean
             ["aa"],                    # must only
             ["bb", "bb"],              # missing must
             ["aa", "bb", "aa"]]        # must + should, clean, higher tf
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs)
    ids = {r["token"]: r["term_id"] for r in vocab.collect()}
    stats = M.fit_from_vocab(vocab, num_docs=5, variant="lucene")
    weighted = M.weight_postings(B.doc2bow_postings(docs, vocab), stats)
    out = T.bool_topk(weighted, must=[ids["aa"]], should=[ids["bb"]],
                      must_not=[ids["cc"]], k=10).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    # d0 excluded (cc), d3 excluded (no aa); d1/d2/d4 survive
    assert set(got) == {1, 2, 4}
    w = {(r["doc_id"], r["term_id"]): r["weight"] for r in weighted.collect()}
    for d in got:
        expect = w[(d, ids["aa"])] + w.get((d, ids["bb"]), 0.0)
        assert got[d] == pytest.approx(expect, rel=1e-12)
    # two must terms: only docs with BOTH
    both = T.bool_topk(weighted, must=[ids["aa"], ids["bb"]], k=10).collect()
    assert {r["doc_id"] for r in both} == {0, 1, 4}
    # empty clause set is an error
    with pytest.raises(ValueError):
        T.bool_topk(weighted)


def test_multi_phrase_occurrences(fixture):
    _, _, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    def mstarts(alts):
        return {r["doc_id"]: sorted(r["starts"])
                for r in PX.multi_phrase_occurrences(pos, alts).collect()}
    # "a (b|c)": d0 'a b c a b' -> 0, 3; d1 'b a b' -> 1; d2/d3 none
    assert mstarts([[a], [b, c]]) == {0: [0, 3], 1: [1]}
    # "(a|b) b": d0 -> 0, 3; d1 -> 1
    assert mstarts([[a, b], [b]]) == {0: [0, 3], 1: [1]}
    # single alternatives degenerate to the plain phrase
    assert mstarts([[a], [b]]) == starts_of(pos, [a, b])
    # every-position-any-term matches every bigram start
    allt = [a, b, c]
    got = mstarts([allt, allt])
    assert got == {0: [0, 1, 2, 3], 1: [0, 1], 2: [0, 1], 3: [0, 1]}
    with pytest.raises(ValueError):
        PX.multi_phrase_occurrences(pos, [[a], []])


def test_multi_phrase_topk_scoring(spark, fixture):
    docs, vocab, vmap, pos = fixture
    a, b, c = vmap["a"], vmap["b"], vmap["c"]
    stats = M.fit_from_vocab(vocab, num_docs=len(TEXTS), variant="lucene")
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    out = PX.multi_phrase_topk(pos, stats, [[a], [b, c]], dl, k=10).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
    # Lucene MultiPhraseWeight: idf = sum over ALL member terms (a, b, c)
    idf = {r["term_id"]: r["idf"] for r in stats.idfs.collect()}
    idf_sum = idf[a] + idf[b] + idf[c]
    dls = {r["doc_id"]: r["dl"] for r in dl.collect()}
    tfs = {0: 2, 1: 1}
    for r in out:
        tf = tfs[r["doc_id"]]
        sat = tf / (tf + stats.k1 * (1 - stats.b
                                     + stats.b * dls[r["doc_id"]] / stats.avgdl))
        assert r["score"] == pytest.approx(idf_sum * sat, rel=1e-9)
        assert r["phrase_tf"] == tf


def _mini_engine(spark, texts):
    from gensim_spark.operators import topk as T  # noqa: F401

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs)
    ids = {r["token"]: r["term_id"] for r in vocab.collect()}
    stats = M.fit_from_vocab(vocab, num_docs=len(texts), variant="lucene")
    weighted = M.weight_postings(B.doc2bow_postings(docs, vocab), stats)
    w = {(r["doc_id"], r["term_id"]): r["weight"] for r in weighted.collect()}
    return docs, vocab, ids, weighted, w


def test_wildcard_translation():
    from gensim_spark.operators.topk import wildcard_pattern_to_like

    assert wildcard_pattern_to_like("s*") == "s%"
    assert wildcard_pattern_to_like("s?an") == "s_an"
    assert wildcard_pattern_to_like("a_b*") == "a\\_b%"
    assert wildcard_pattern_to_like("50%?") == "50\\%_"
    # Lucene escape syntax (ADVICE r4): \* is a LITERAL asterisk, \? a
    # literal question mark, \\ a literal backslash; escaped chars that are
    # LIKE metacharacters get LIKE-escaped
    assert wildcard_pattern_to_like("a\\*b") == "a*b"
    assert wildcard_pattern_to_like("a\\?b") == "a?b"
    assert wildcard_pattern_to_like("a\\\\b") == "a\\\\b"   # \\ → literal \
    assert wildcard_pattern_to_like("a\\%b") == "a\\%b"     # escaped % stays
    assert wildcard_pattern_to_like("a\\b") == "ab"         # \b → literal b
    assert wildcard_pattern_to_like("a\\") == "a\\\\"       # lenient trailer


def test_wildcard_topk(spark):
    from gensim_spark.operators import topk as T

    texts = [["aa", "ab", "bb"], ["aa", "bb"], ["bb"]]
    docs, vocab, ids, weighted, w = _mini_engine(spark, texts)
    # 'a?' expands to {aa, ab} — identical to the prefix 'a' on this vocab
    got = {r["doc_id"]: r["score"]
           for r in T.wildcard_topk(weighted, vocab, "a?", k=10).collect()}
    expect = {0: w[(0, ids["aa"])] + w[(0, ids["ab"])], 1: w[(1, ids["aa"])]}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], rel=1e-12)
    # '?b' expands to {ab, bb}: every doc matches
    got2 = {r["doc_id"]: r["score"]
            for r in T.wildcard_topk(weighted, vocab, "?b", k=10).collect()}
    exp2 = {0: w[(0, ids["ab"])] + w[(0, ids["bb"])],
            1: w[(1, ids["bb"])], 2: w[(2, ids["bb"])]}
    assert set(got2) == set(exp2)
    for d in exp2:
        assert got2[d] == pytest.approx(exp2[d], rel=1e-12)
    # '*' prefix-free wildcard matches everything; 'zz*' nothing
    assert T.wildcard_topk(weighted, vocab, "*b", k=10).count() == 3
    assert T.wildcard_topk(weighted, vocab, "zz*", k=10).count() == 0


def test_fuzzy_expansion(spark):
    from gensim_spark.operators import topk as T

    toks = ["cat", "bat", "hat", "cart", "dog", "cast", "catch"]
    docs = spark.createDataFrame(
        [(0, toks)], "doc_id long, tokens array<string>")
    vocab = V.build_vocab(docs)
    got1 = {r["token"]: r["distance"] for r in
            T.fuzzy_expand_terms(vocab, "cat", max_distance=1).collect()}
    assert got1 == {"cat": 0, "bat": 1, "hat": 1, "cart": 1, "cast": 1}
    got2 = {r["token"]: r["distance"] for r in
            T.fuzzy_expand_terms(vocab, "cat", max_distance=2).collect()}
    assert got2 == {"cat": 0, "bat": 1, "hat": 1, "cart": 1, "cast": 1,
                    "catch": 2}
    # prefixLength pins the leading chars (Lucene's prefixLength)
    got_p = {r["token"] for r in
             T.fuzzy_expand_terms(vocab, "cat", 1, prefix_len=1).collect()}
    assert got_p == {"cat", "cart", "cast"}


def test_fuzzy_topk_manual_sums(spark):
    from gensim_spark.operators import topk as T

    texts = [["cat", "dog"], ["bat", "bat"], ["cart", "dog"], ["dog"]]
    docs, vocab, ids, weighted, w = _mini_engine(spark, texts)
    out = {r["doc_id"]: r["score"]
           for r in T.fuzzy_topk(weighted, vocab, "cat",
                                 max_distance=1, k=10).collect()}
    # expansion {cat, bat, cart}; d3 (dog only) drops
    expect = {0: w[(0, ids["cat"])], 1: w[(1, ids["bat"])],
              2: w[(2, ids["cart"])]}
    assert set(out) == set(expect)
    for d in expect:
        assert out[d] == pytest.approx(expect[d], rel=1e-12)


def test_bool_min_should_match_and_boosts(spark):
    from gensim_spark.operators import topk as T

    texts = [["aa", "bb", "cc"],   # all three
             ["aa", "bb"],         # two should
             ["aa", "cc"],         # two should (other pair)
             ["aa"],               # one should
             ["bb", "cc"]]         # two should, no aa
    docs, vocab, ids, weighted, w = _mini_engine(spark, texts)
    sh = [ids["aa"], ids["bb"], ids["cc"]]
    # pure should query, msm=2: docs with >=2 distinct should terms
    out = {r["doc_id"] for r in T.bool_topk(
        weighted, should=sh, min_should_match=2, k=10).collect()}
    assert out == {0, 1, 2, 4}
    out3 = {r["doc_id"] for r in T.bool_topk(
        weighted, should=sh, min_should_match=3, k=10).collect()}
    assert out3 == {0}
    with pytest.raises(ValueError):
        T.bool_topk(weighted, should=sh, min_should_match=4)
    # boosts scale the clause contribution (BoostQuery)
    boosted = {r["doc_id"]: r["score"] for r in T.bool_topk(
        weighted, should=[ids["aa"], ids["bb"]],
        boosts={ids["bb"]: 3.0}, k=10).collect()}
    for d in boosted:
        expect = (w.get((d, ids["aa"]), 0.0)
                  + 3.0 * w.get((d, ids["bb"]), 0.0))
        assert boosted[d] == pytest.approx(expect, rel=1e-12)
    # msm composes with must/must_not: must aa, msm 1 of {bb, cc}
    comp = {r["doc_id"] for r in T.bool_topk(
        weighted, must=[ids["aa"]], should=[ids["bb"], ids["cc"]],
        min_should_match=1, k=10).collect()}
    assert comp == {0, 1, 2}


def test_span_first_topk(spark, fixture):
    docs, vocab, vmap, pos = fixture
    a = vmap["a"]
    stats = M.fit_from_vocab(vocab, num_docs=len(TEXTS), variant="lucene")
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    # 'a' positions: d0 [0,3], d1 [1], d2 [2], d3 [0,1,2]
    out = {r["doc_id"]: (r["first_tf"], r["score"]) for r in
           PX.span_first_topk(pos, stats, a, end=2, dl=dl, k=10).collect()}
    assert {d: tf for d, (tf, _) in out.items()} == {0: 1, 1: 1, 3: 2}
    idf = {r["term_id"]: r["idf"] for r in stats.idfs.collect()}[a]
    dls = {r["doc_id"]: r["dl"] for r in dl.collect()}
    for d, (tf, score) in out.items():
        sat = tf / (tf + stats.k1 * (1 - stats.b
                                     + stats.b * dls[d] / stats.avgdl))
        assert score == pytest.approx(idf * sat, rel=1e-9)
    out1 = {r["doc_id"]: r["first_tf"] for r in
            PX.span_first_topk(pos, stats, a, end=1, dl=dl, k=10).collect()}
    assert out1 == {0: 1, 3: 1}
    with pytest.raises(ValueError):
        PX.span_first_topk(pos, stats, a, end=0, dl=dl)


def test_more_like_this(spark):
    from gensim_spark.operators import topk as T

    texts = [["rare", "mid", "common", "common"],
             ["rare", "other"],
             ["mid", "common"],
             ["other", "common"]]
    docs, vocab, ids, weighted, w = _mini_engine(spark, texts)
    dfs = {r["term_id"]: r["df"] for r in vocab.collect()}

    def manual(src, mqt, min_df=1, max_df=None):
        cand = [(t, abs(w[(src, ids[t])])) for t in set(texts[src])
                if dfs[ids[t]] >= min_df
                and (max_df is None or dfs[ids[t]] <= max_df)]
        cand.sort(key=lambda x: (-x[1], ids[x[0]]))
        sel = [ids[t] for t, _ in cand[:mqt]]
        scores = {}
        for d in range(len(texts)):
            if d == src:
                continue
            s = sum(w[(d, t)] for t in sel if (d, t) in w)
            if s != 0.0:
                scores[d] = s
        return sel, scores

    for mqt, min_df, max_df in [(2, 1, None), (25, 1, None), (25, 1, 2),
                                (25, 3, None)]:
        sel, want = manual(0, mqt, min_df, max_df)
        got_sel = {r["term_id"] for r in T.mlt_select_terms(
            weighted, vocab, 0, mqt, min_df, max_df).collect()}
        assert got_sel == set(sel)
        got = {r["doc_id"]: r["score"] for r in T.more_like_this(
            weighted, vocab, 0, mqt, min_df, max_df, k=10).collect()}
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], rel=1e-12)
        assert 0 not in got  # source doc excluded


def test_collapse_topk(spark):
    from gensim_spark.operators import topk as T

    scores = spark.createDataFrame(
        [(0, 0, 5.0), (0, 1, 4.0), (0, 2, 3.0), (0, 3, -6.0), (0, 4, 4.0)],
        "query_id int, doc_id long, score double")
    meta = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c")],
        "doc_id long, site string")
    out = T.collapse_topk(scores, meta, "site", k=10).orderBy("rank").collect()
    # site a -> doc 0 (5.0); site b -> doc 3 (|-6| > 3); site c -> doc 4
    assert [(r["doc_id"], r["site"], r["score"], r["rank"]) for r in out] == \
        [(3, "b", -6.0, 1), (0, "a", 5.0, 2), (4, "c", 4.0, 3)]
    # tie inside a site: doc_id asc wins
    scores2 = spark.createDataFrame(
        [(0, 1, 4.0), (0, 0, 4.0)], "query_id int, doc_id long, score double")
    out2 = T.collapse_topk(scores2, meta, "site", k=10).collect()
    assert [(r["doc_id"], r["rank"]) for r in out2] == [(0, 1)]
    # k clips after collapsing
    assert T.collapse_topk(scores, meta, "site", k=2).count() == 2


def test_rocchio_feedback(spark):
    from gensim_spark.operators import topk as T

    texts = [["aa", "bb", "cc"], ["aa", "bb"], ["aa", "dd", "dd"],
             ["bb", "cc", "dd"], ["ee", "ee"], ["aa", "cc"]]
    docs, vocab, ids, weighted, w = _mini_engine(spark, texts)
    qt = T.query_terms_df(spark, {0: [ids["aa"]]})
    fb_docs, fb_terms, alpha, beta = 3, 2, 1.0, 0.75

    # manual replica from the collected weights
    s1 = {}
    for (d, t), wt in w.items():
        if t == ids["aa"]:
            s1[d] = s1.get(d, 0.0) + wt
    top = sorted((d for d in s1 if s1[d] != 0.0),
                 key=lambda d: (-abs(s1[d]), d))[:fb_docs]
    cent = {}
    for (d, t), wt in w.items():
        if d in top:
            cent[t] = cent.get(t, 0.0) + wt / len(top)
    cand = sorted((t for t in cent if t != ids["aa"]),
                  key=lambda t: (-abs(cent[t]), t))[:fb_terms]
    qw = {ids["aa"]: alpha * 1.0}
    for t in cand:
        qw[t] = beta * cent[t]
    want = {}
    for (d, t), wt in w.items():
        if t in qw:
            want[d] = want.get(d, 0.0) + wt * qw[t]
    want = {d: s for d, s in want.items() if s != 0.0}

    exp = {(r["term_id"]): r["q_weight"] for r in T.rocchio_expand(
        weighted, qt, fb_docs, fb_terms, alpha, beta).collect()}
    assert set(exp) == set(qw)
    for t in qw:
        assert exp[t] == pytest.approx(qw[t], rel=1e-12)
    got = {r["doc_id"]: r["score"] for r in T.rocchio_topk(
        weighted, qt, fb_docs, fb_terms, alpha, beta, k=None).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)

    # feedback set smaller than fb_docs: "dd" matches only docs 2 and 3, so
    # the centroid must average over 2 docs, not the fb_docs=3 literal
    # (classic Rocchio divides by |Dr|; ADVICE r4)
    qt_dd = T.query_terms_df(spark, {0: [ids["dd"]]})
    exp_dd = {r["term_id"]: r["q_weight"] for r in T.rocchio_expand(
        weighted, qt_dd, fb_docs, fb_terms, alpha, beta).collect()}
    cent_dd = {}
    for (d, t), wt in w.items():
        if d in (2, 3) and t != ids["dd"]:
            cent_dd[t] = cent_dd.get(t, 0.0) + wt / 2
    cand_dd = sorted(cent_dd, key=lambda t: (-abs(cent_dd[t]), t))[:fb_terms]
    assert exp_dd[ids["dd"]] == pytest.approx(alpha * 1.0)
    assert set(exp_dd) == {ids["dd"], *cand_dd}
    for t in cand_dd:
        assert exp_dd[t] == pytest.approx(beta * cent_dd[t], rel=1e-12)


def test_regexp_topk(spark):
    from gensim_spark.operators import topk as T

    texts = [["aa", "ab", "bb"], ["aa", "bb"], ["bb"], ["abc"]]
    docs, vocab, ids, weighted, w = _mini_engine(spark, texts)
    # whole-term match: 'a.' hits aa/ab but NOT abc (no substring search)
    got = {r["doc_id"]: r["score"]
           for r in T.regexp_topk(weighted, vocab, "a.", k=10).collect()}
    expect = {0: w[(0, ids["aa"])] + w[(0, ids["ab"])], 1: w[(1, ids["aa"])]}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], rel=1e-12)
    # alternation + quantifier (the portable subset)
    got2 = {r["doc_id"] for r in
            T.regexp_topk(weighted, vocab, "a+b*c?", k=10).collect()}
    assert got2 == {0, 1, 3}
    assert T.regexp_topk(weighted, vocab, "zz+", k=10).count() == 0
