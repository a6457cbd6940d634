"""Snippet extraction / highlighting (operators/highlight.py) — golden
windows, tie semantics, marking, top-k join, and brute-force parity."""
import random

import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import highlight as H


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, tokens array<string>")


def brute_best(tokens, q, width):
    """Reference: best hit-anchored window by (distinct terms desc,
    start asc); None when no hit."""
    qs = set(q)
    hits = [i for i, t in enumerate(tokens) if t in qs]
    if not hits:
        return None
    best = None
    for s in hits:
        n = len({tokens[i] for i in hits if s <= i < s + width})
        key = (-n, s)
        if best is None or key < best[0]:
            best = (key, s, n)
    _, s, n = best
    return s, n, " ".join(tokens[s:s + width])


def test_best_snippet_goldens(spark):
    texts = [
        # hits at 1 (x) and 5,6 (x,y): window 4 starting at 5 covers both
        ["a", "x", "b", "c", "d", "x", "y", "e"],
        ["p", "q", "r"],                      # no hits -> dropped
        ["y", "a", "a", "a", "x"],            # width 4: no window has both
    ]
    out = {r["doc_id"]: (r["start"], r["n_terms"], r["snippet"])
           for r in H.best_snippets(_docs(spark, texts), ["x", "y"],
                                    width=4).collect()}
    assert set(out) == {0, 2}
    assert out[0] == (5, 2, "x y e")
    # d2: both single-term windows tie at n=1 -> earliest anchor (0)
    assert out[2] == (0, 1, "y a a a")


def test_snippet_marking_and_width_one(spark):
    texts = [["u", "x", "v", "y"]]
    out = H.best_snippets(_docs(spark, texts), ["x", "y"], width=3,
                          mark=True).collect()[0]
    assert out["start"] == 1 and out["n_terms"] == 2
    assert out["snippet"] == "<b>x</b> v <b>y</b>"
    w1 = H.best_snippets(_docs(spark, texts), ["y"], width=1,
                         mark=True).collect()[0]
    assert (w1["start"], w1["n_terms"], w1["snippet"]) == (3, 1, "<b>y</b>")
    with pytest.raises(ValueError):
        H.best_snippets(_docs(spark, texts), [], width=3)
    with pytest.raises(ValueError):
        H.best_snippets(_docs(spark, texts), ["x"], width=0)


def test_duplicate_hits_count_once(spark):
    # window with x,x,x scores 1 distinct term; x..y window wins
    texts = [["x", "x", "x", "z", "x", "y"]]
    out = H.best_snippets(_docs(spark, texts), ["x", "y"], width=2).collect()[0]
    assert (out["start"], out["n_terms"], out["snippet"]) == (4, 2, "x y")


def test_window_clipped_at_doc_end(spark):
    texts = [["a", "b", "x"]]
    out = H.best_snippets(_docs(spark, texts), ["x"], width=5).collect()[0]
    assert (out["start"], out["n_terms"], out["snippet"]) == (2, 1, "x")


def test_highlight_topk_join(spark):
    texts = [["x", "a"], ["b", "x", "y"], ["c", "d"]]
    docs = _docs(spark, texts)
    topk = spark.createDataFrame(
        [(1, 2.0, 1), (0, 1.0, 2)], "doc_id long, score double, rank int")
    out = {r["doc_id"]: r for r in
           H.highlight_topk(docs, topk, ["x", "y"], width=2).collect()}
    assert set(out) == {0, 1}
    assert out[1]["snippet"] == "<b>x</b> <b>y</b>"
    assert out[0]["snippet"] == "<b>x</b> a"
    assert out[1]["score"] == 2.0 and out[1]["rank"] == 1
    # snippet work is pruned to the k result docs before the fold:
    # doc 2 never enters the plan (semi-join), no row for it
    assert 2 not in out


def test_brute_force_parity(spark):
    rng = random.Random(7)
    alpha = ["t%d" % i for i in range(12)]
    q = ["t1", "t3", "t5"]
    texts = [[rng.choice(alpha) for _ in range(rng.randint(1, 30))]
             for _ in range(40)]
    for width in (1, 3, 7):
        got = {r["doc_id"]: (r["start"], r["n_terms"], r["snippet"])
               for r in H.best_snippets(_docs(spark, texts), q,
                                        width=width).collect()}
        want = {i: brute_best(t, q, width) for i, t in enumerate(texts)}
        want = {i: v for i, v in want.items() if v is not None}
        assert got == want
