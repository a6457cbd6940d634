"""Hand-computed goldens for the Gopher-style repetition quality signals
(textstats.repetition_stats). The entry-level DuckDB oracle re-derives the
same numbers relationally; these pin the exact definitions."""

import pytest

from gensim_spark.operators import textstats as TS


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, tokens array<string>")
    return {r.doc_id: r.asDict() for r in TS.repetition_stats(df).collect()}


def test_repetition_hand_computed(spark):
    rows = [
        # dup lines: ["a b","a b","c d"] -> 1/3 lines, 3/9 chars duplicated;
        # paragraphs ["a b\na b", "c d"] all distinct
        (0, "a b\na b\n\nc d", ["x", "y", "x", "y", "x"]),
        # repeated 5-gram: abcde twice in 6 grams -> 1/6; top 2-gram 2/9
        (1, "unique line", ["a", "b", "c", "d", "e",
                            "a", "b", "c", "d", "e"]),
        (2, "", []),                       # empty everything -> all zeros
        (3, "one", ["solo"]),              # too short for any n-gram
    ]
    out = _run(spark, rows)

    assert out[0]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[0]["dup_line_char_frac"] == pytest.approx(3 / 9, abs=1e-6)
    assert out[0]["dup_para_frac"] == 0.0
    # 2-grams of x y x y x: xy,yx,xy,yx -> top 2/4
    assert out[0]["top_2gram_frac"] == pytest.approx(0.5, abs=1e-6)
    assert out[0]["dup_5gram_frac"] == 0.0  # single 5-gram

    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["top_2gram_frac"] == pytest.approx(2 / 9, abs=1e-6)
    assert out[1]["dup_5gram_frac"] == pytest.approx(1 / 6, abs=1e-6)

    for k in ("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
              "top_2gram_frac", "dup_5gram_frac"):
        assert out[2][k] == 0.0
        assert out[3][k] == 0.0


def test_repetition_boilerplate_page_flagged(spark):
    # a nav-menu-stuffed page vs clean prose: the filters must separate them
    menu = "home | products | about\n" * 8 + "actual content line"
    prose = ("this page discusses a range of genuinely distinct topics\n"
             "each line brings new words to the table\n"
             "no two lines repeat themselves here")
    rows = [
        (0, menu, ("home products about " * 8 + "actual content").split()),
        (1, prose, prose.replace("\n", " ").split()),
    ]
    out = _run(spark, rows)
    assert out[0]["dup_line_frac"] > 0.7
    assert out[0]["top_2gram_frac"] > 0.2
    assert out[0]["dup_5gram_frac"] > 0.5
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup_5gram_frac"] == 0.0
