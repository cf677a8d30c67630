"""A6 word-break tokenizer goldens (reference
WordBreakTokenizerTest semantics on the built-in demo dictionary)."""

import pytest

from peterman_search_engine_spark.functions.wordbreak import (
    DEMO_FREQ,
    word_break,
    word_break_udf,
)


def test_basic_segmentation():
    # mirrors the reference's canonical case: stop words removed after
    # the split ("i", "it", "is" are stop words)
    assert word_break("ilikecomputerscience", DEMO_FREQ) == [
        "like", "computer", "science",
    ]


def test_probability_maximization():
    # "anews" could split a-news or an-ews(invalid); DP must pick the
    # valid max-probability path
    assert word_break("thenewstoday", DEMO_FREQ) == ["news", "today"]


def test_case_insensitive():
    assert word_break("ILikeComputerScience", DEMO_FREQ) == [
        "like", "computer", "science",
    ]


def test_empty():
    assert word_break("", DEMO_FREQ) == []
    assert word_break("   ", DEMO_FREQ) == []


def test_unbreakable_raises():
    with pytest.raises(ValueError):
        word_break("zzzqqqxxx", DEMO_FREQ)


def test_udf(spark):
    df = spark.createDataFrame(
        [(0, "ilikecomputerscience"), (1, "stemmingisimportant")],
        "id long, text string",
    )
    rows = {r["id"]: r["toks"] for r in df.select(
        "id", word_break_udf()(df.text).alias("toks")
    ).collect()}
    assert rows[0] == ["like", "computer", "science"]
    assert rows[1] == ["stemming", "important"]


def test_japanese_dictionary():
    """A7 JapaneseWordBreakTokenizer semantics: the same DP over a
    different (Japanese) frequency dictionary — the reference's A7 is
    A6 with the 60,993-entry Japanese Twitter dict swapped in
    (JapaneseWordBreakTokenizer.java:94-163). Unicode goes through the
    same Python DP (frequencies favor the multi-char segmentation)."""
    freq = {
        "自然": 100, "言語": 90, "処理": 80, "自然言語": 500,
        "です": 70, "は": 5, "楽しい": 60,
    }
    assert word_break("自然言語処理", freq) == ["自然言語", "処理"]
    assert word_break("自然言語処理は楽しいです", freq) == [
        "自然言語", "処理", "は", "楽しい", "です",
    ]


def test_japanese_udf(spark):
    freq = {"自然言語": 500, "処理": 80}
    df = spark.createDataFrame([(0, "自然言語処理")], "id long, text string")
    rows = df.select(word_break_udf(freq)(df.text).alias("toks")).collect()
    assert rows[0]["toks"] == ["自然言語", "処理"]
