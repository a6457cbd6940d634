"""KeyedVectors batch evaluation: planted-analogy recovery (3CosAdd),
case folding / OOV / dummy4unknown semantics, rank ties, correlation +
p-values against independent anchors (numpy corrcoef, t-table points)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gensim_spark.functions.special import betainc, student_t_sf2
from gensim_spark.operators import keyedvectors as KV


def _planted_vecs(spark):
    # exact linear analogy structure: queen = king - man + woman, and a
    # second relation for a second section; distractors far away
    rng = np.random.default_rng(0)
    base = {
        "man": [1.0, 0.0, 0.0, 0.1],
        "woman": [0.0, 1.0, 0.0, 0.1],
        "king": [1.0, 0.0, 1.0, 0.1],
        "queen": [0.0, 1.0, 1.0, 0.1],
        "paris": [0.0, 0.0, 0.0, 1.0],
        "france": [0.5, 0.0, 0.0, 1.0],
        "rome": [0.0, 0.0, 1.0, 1.0],
        "italy": [0.5, 0.0, 1.0, 1.0],
    }
    for i in range(6):
        base[f"noise{i}"] = [float(x)
                             for x in rng.uniform(-1, 1, 4) * 0.1 + 3.0]
    rows = [(w, i, v) for i, (w, v) in enumerate(base.items())]
    return spark.createDataFrame(
        rows, "word string, word_id long, embedding array<double>")


def _questions(spark, rows):
    return spark.createDataFrame(
        rows, "section string, a string, b string, c string, "
              "expected string")


def test_analogies_planted(spark):
    vecs = _planted_vecs(spark)
    qs = _questions(spark, [
        ("royalty", "man", "woman", "king", "queen"),
        ("royalty", "woman", "man", "queen", "king"),
        ("capitals", "paris", "france", "rome", "italy"),
    ])
    score, sections, oov = KV.evaluate_word_analogies(vecs, qs)
    assert oov == 0
    assert score == 1.0
    names = {s["section"]: s for s in sections}
    assert len(names["royalty"]["correct"]) == 2
    assert len(names["capitals"]["correct"]) == 1
    total = names["Total accuracy"]
    assert len(total["correct"]) == 3 and not total["incorrect"]
    # case folding: lowercase questions against the same vocab
    qs2 = _questions(spark, [("r", "MAN", "Woman", "King", "QUEEN")])
    score2, _, _ = KV.evaluate_word_analogies(vecs, qs2,
                                              case_insensitive=True)
    assert score2 == 1.0


def test_analogies_oov_and_dummy(spark):
    vecs = _planted_vecs(spark)
    qs = _questions(spark, [
        ("s", "man", "woman", "king", "queen"),
        ("s", "man", "woman", "UNSEEN", "queen"),
    ])
    score, sections, oov = KV.evaluate_word_analogies(vecs, qs)
    assert oov == 1 and score == 1.0          # OOV skipped
    score, sections, oov = KV.evaluate_word_analogies(
        vecs, qs, dummy4unknown=True)
    assert oov == 1 and score == 0.5          # OOV counted incorrect
    # restrict_vocab needs an order column
    with pytest.raises(ValueError):
        KV.evaluate_word_analogies(vecs.drop("word_id"), qs,
                                   restrict_vocab=4, index_col=None)


def test_analogies_restrict_vocab(spark):
    vecs = _planted_vecs(spark)
    qs = _questions(spark, [("s", "man", "woman", "king", "queen")])
    # first 4 vocab rows include all of man/woman/king/queen → answerable
    score, _, oov = KV.evaluate_word_analogies(vecs, qs, restrict_vocab=4,
                                               index_col="word_id")
    assert score == 1.0 and oov == 0
    # cutting to 3 drops 'queen' → the quadruplet goes OOV
    _, _, oov = KV.evaluate_word_analogies(vecs, qs, restrict_vocab=3,
                                           index_col="word_id")
    assert oov == 1


def test_rankdata_ties():
    np.testing.assert_array_equal(
        KV._rankdata(np.array([1.0, 2.0, 2.0, 3.0])),
        np.array([1.0, 2.5, 2.5, 4.0]))


def test_pearson_matches_numpy_and_t_table():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(30)
    y = 0.6 * x + 0.8 * rng.standard_normal(30)
    r, p = KV._pearson(x, y)
    assert r == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-12)
    # p from the same t, via the betainc verified against t-table points
    t = r * np.sqrt(28 / (1 - r * r))
    assert p == pytest.approx(student_t_sf2(abs(t), 28), abs=1e-15)
    # the betainc anchors themselves
    assert betainc(0.5, 0.5, 0.5) == pytest.approx(0.5, abs=1e-12)
    assert student_t_sf2(2.228, 10) == pytest.approx(0.05, abs=2e-4)
    # perfect correlation → p = 0
    r, p = KV._pearson(np.arange(5.0), 2 * np.arange(5.0) + 1)
    assert r == 1.0 and p == 0.0


def test_word_pairs_end_to_end(spark):
    vecs = _planted_vecs(spark)
    pairs = spark.createDataFrame(
        [("man", "king", 8.0), ("woman", "queen", 8.5),
         ("man", "paris", 1.0), ("king", "rome", 2.0),
         ("man", "UNSEEN", 5.0)],
        "word1 string, word2 string, sim double")
    (pr, pp), (sr, sp), oov = KV.evaluate_word_pairs(vecs, pairs,
                                                     key_col="word")
    assert oov == pytest.approx(20.0)      # 1 of 5 skipped
    # gold ranks related pairs above unrelated ones and so does the model
    assert pr > 0.8 and sr > 0.8
    assert 0 <= pp < 0.5 and 0 <= sp < 0.5
    # dummy4unknown: OOV pair scored 0, ratio over scored rows
    (_, _), (_, _), oov2 = KV.evaluate_word_pairs(
        vecs, pairs, dummy4unknown=True)
    assert oov2 == pytest.approx(20.0)


def test_facade_eval(spark):
    from gensim_spark.api import KeyedVectors

    kv = KeyedVectors(_planted_vecs(spark), key_col="word")
    qs = _questions(spark, [("s", "man", "woman", "king", "queen")])
    score, sections = kv.evaluate_word_analogies(qs)
    assert score == 1.0 and sections[-1]["section"] == "Total accuracy"


def test_wmdistance(spark):
    vecs = _planted_vecs(spark)
    d = lambda a, b: KV.wmdistance(vecs, a, b, key_col="word")
    # identical docs → 0
    assert d(["man", "king"], ["king", "man"]) == pytest.approx(0.0)
    # single shared unique token → 0.0 (reference vocab_len==1 path)
    assert d(["man", "man"], ["man"]) == 0.0
    # OOV-emptied side → inf
    assert d(["UNSEEN1", "UNSEEN2"], ["man"]) == float("inf")
    # symmetric, positive, and equals the brute-force LP on the same nbows
    from gensim_spark.operators.transport import emd_bruteforce

    got = d(["man", "woman"], ["king", "queen"])
    assert got == pytest.approx(d(["king", "queen"], ["man", "woman"]))
    import numpy as np

    rows = {r["word"]: np.asarray(r["embedding"])
            for r in vecs.collect()}
    unit = {w: v / np.linalg.norm(v) for w, v in rows.items()}
    cost = np.array([[np.linalg.norm(unit[x] - unit[y])
                      for y in ("king", "queen")]
                     for x in ("man", "woman")])
    want = emd_bruteforce(np.array([0.5, 0.5]), np.array([0.5, 0.5]),
                          cost)
    assert got == pytest.approx(want, abs=1e-12)
    # norm=False changes the metric (raw euclidean)
    assert d(["man", "woman"], ["king", "queen"]) != pytest.approx(
        KV.wmdistance(vecs, ["man", "woman"], ["king", "queen"],
                      norm=False, key_col="word"))
