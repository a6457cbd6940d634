"""BPE tokenizer: incremental trainer vs a naive full-recount reference,
ranks-loop encode vs training-order replay, relational pair counts vs a
Counter, distributed encode parity + partitioning invariance."""
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gensim_spark.operators import bpe


# --- naive reference: recount every pair from scratch each merge ------------

def _ref_syms(word):
    return (word + "</w>",) if len(word) <= 1 else \
        tuple(word[:-1]) + (word[-1] + "</w>",)


def _ref_pair_counts(vocab):
    c = Counter()
    for syms, cnt in vocab:
        for p in zip(syms, syms[1:]):
            c[p] += cnt
    return c


def _ref_train(hist, num_merges, min_pair_count=2):
    vocab = [(_ref_syms(w), c) for w, c in sorted(hist.items())]
    merges = []
    for _ in range(num_merges):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        merges.append(best[0])
        vocab = [(bpe._merge_syms(s, best[0]), c) for s, c in vocab]
    return merges


def _ref_encode_training_order(word, merges):
    """Sennrich apply_bpe convention: replay merges in training order."""
    s = _ref_syms(word)
    for m in merges:
        if len(s) < 2:
            break
        s = bpe._merge_syms(s, m)
    return list(s)


def _rand_hist(seed, n_words=60, alpha="abcdef"):
    rng = random.Random(seed)
    return {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 9))):
            rng.randint(1, 50) for _ in range(n_words)}


# --- driver-side algorithm parity (no Spark) ---------------------------------

def test_golden_sennrich_corpus():
    """The paper's worked example: es fuses first (newest 6 + widest 3),
    then est, then est</w>; low/lower drive lo, low."""
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    model = bpe.bpe_train(hist, 10, collected=True)
    # hand-computed: (e,s) and (s,t</w>) tie at 9, lexicographic min wins;
    # the fused es then rejoins t</w> at 9 (canonical form rides </w> on
    # the last char: newest -> n,e,w,e,s,t</w>)
    assert model.merges[0] == ("e", "s")
    assert model.merges[1] == ("es", "t</w>")
    assert _ref_train(hist, 10) == model.merges
    # the trained model segments a training word to a single symbol chain
    enc = model.encode_word("newest")
    assert "".join(enc) == "newest</w>"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_incremental_trainer_matches_naive_recount(seed):
    hist = _rand_hist(seed)
    want = _ref_train(hist, 40)
    got = bpe.bpe_train(hist, 40, collected=True).merges
    assert got == want


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_ranks_loop_encode_matches_training_order_replay(seed):
    hist = _rand_hist(seed, n_words=40)
    model = bpe.bpe_train(hist, 30, collected=True)
    rng = random.Random(seed + 99)
    words = list(hist) + ["zzz", "q", ""] + [
        "".join(rng.choice("abcdefgz") for _ in range(rng.randint(1, 12)))
        for _ in range(60)]
    for w in words:
        if not w:
            continue
        assert model.encode_word(w) == \
            _ref_encode_training_order(w, model.merges), w


def test_encode_roundtrip_reconstructs_word():
    hist = _rand_hist(21)
    model = bpe.bpe_train(hist, 25, collected=True)
    for w in list(hist) + ["unseenword", "x"]:
        enc = model.encode_word(w)
        assert "".join(enc) == w + "</w>"


def test_min_pair_count_stops_early():
    hist = {"ab": 1, "cd": 1}  # every pair count is 1 < 2
    assert bpe.bpe_train(hist, 5, collected=True).merges == []


# --- Spark-side: histogram, relational pair counts, distributed encode -------

def _toy_tokens(spark):
    rows = [(0, ["low", "low", "lower"]), (1, ["newest", "widest"]),
            (2, ["newest", "newest", "low"]), (3, ["widest", "a"])]
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_word_histogram_and_relational_pair_counts(spark):
    tok = _toy_tokens(spark)
    hist_df = bpe.word_histogram(tok)
    hist = {r["word"]: r["cnt"] for r in hist_df.collect()}
    assert hist == {"low": 3, "lower": 1, "newest": 3, "widest": 2, "a": 1}
    got = {(r["left"], r["right"]): r["cnt"]
           for r in bpe.pair_counts(hist_df).collect()}
    want = _ref_pair_counts([(_ref_syms(w), c) for w, c in hist.items()])
    assert got == dict(want)
    # single-char word contributes no pair but a lone 'a</w>' symbol
    assert ("a", "</w>") not in got


def test_distributed_encode_matches_driver_and_partitioning(spark):
    tok = _toy_tokens(spark)
    hist_df = bpe.word_histogram(tok)
    model = bpe.bpe_train(hist_df, 20)
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in model.encode(tok).collect()}
    for r in tok.collect():
        want = [p for w in r["tokens"] for p in model.encode_word(w)]
        assert out[r["doc_id"]] == want
    out7 = {r["doc_id"]: r["bpe_tokens"]
            for r in model.encode(tok.repartition(7)).collect()}
    assert out7 == out


def test_model_save_load_roundtrip(tmp_path):
    model = bpe.bpe_train(_rand_hist(5), 15, collected=True)
    p = str(tmp_path / "merges.json")
    model.save(p)
    loaded = bpe.BpeModel.load(p)
    assert loaded.merges == model.merges
    assert loaded.encode_word("feadbc") == model.encode_word("feadbc")


def test_driver_types_guard(spark):
    hist_df = bpe.word_histogram(_toy_tokens(spark))
    old = bpe.MAX_DRIVER_TYPES
    bpe.MAX_DRIVER_TYPES = 2
    try:
        with pytest.raises(ValueError, match="MAX_DRIVER_TYPES"):
            bpe.bpe_train(hist_df, 5)
    finally:
        bpe.MAX_DRIVER_TYPES = old


def test_model_load_accepts_bare_list_format(tmp_path):
    import json
    model = bpe.bpe_train(_rand_hist(3), 10, collected=True)
    p = str(tmp_path / "bare.json")
    with open(p, "w") as f:
        json.dump([list(m) for m in model.merges], f)
    assert bpe.BpeModel.load(p).merges == model.merges


def test_encode_broadcast_is_memoized(spark):
    tok = _toy_tokens(spark)
    model = bpe.bpe_train(bpe.word_histogram(tok), 10)
    model.encode(tok).count()
    bc1 = model._bc
    model.encode(tok).count()
    assert model._bc is bc1
