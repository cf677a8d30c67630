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
