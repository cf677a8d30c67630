"""Edge cases for the round-2 query-side additions: boolean NOT,
prefix search, metadata-filtered BM25, snippets, facet counts."""

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import build_index


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (0, "spark merge window fast"),
        (1, "spark merge vector"),
        (2, "merge stream batch"),
        (3, "window sort"),
        (4, "spark spark merge merge window stream"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(corpus, stem=False, positional=True), corpus


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_and_not_basic(idx):
    index, _ = idx
    # merge AND NOT (vector OR stream): docs 0,1,2,4 have merge;
    # 1 has vector, 2 and 4 have stream -> {0}
    got = Q.search_and_not(index, ["merge"], ["vector", "stream"])
    assert _ids(got) == [0]


def test_and_not_empty_exclude_is_and(idx):
    index, _ = idx
    assert _ids(Q.search_and_not(index, ["merge"], [])) == _ids(
        Q.search_and(index, ["merge"])
    )


def test_and_not_stopword_only_exclude(idx):
    # exclude terms that analyze to nothing -> plain AND
    index, _ = idx
    assert _ids(Q.search_and_not(index, ["merge"], ["the", "a"])) == _ids(
        Q.search_and(index, ["merge"])
    )


def test_prefix_matches_multiple_terms(idx):
    index, _ = idx
    # "s" -> spark(0,1,4), stream(2,4), sort(3) = all docs
    assert _ids(Q.search_prefix(index, "s")) == [0, 1, 2, 3, 4]
    # "st" -> stream only
    assert _ids(Q.search_prefix(index, "st")) == [2, 4]


def test_prefix_case_and_empty(idx):
    index, _ = idx
    assert _ids(Q.search_prefix(index, "ST")) == [2, 4]
    assert Q.search_prefix(index, "   ").count() == 0


def test_filtered_bm25_scores_unchanged(idx):
    index, _ = idx
    spark = index.postings.sparkSession
    allowed = spark.createDataFrame([(1,), (2,)], "doc_id long")
    full = {r.doc_id: r.score for r in Q.search_bm25(index, ["merge"], None).collect()}
    filt = Q.search_bm25_filtered(index, ["merge"], allowed, None).collect()
    assert sorted(r.doc_id for r in filt) == [1, 2]
    for r in filt:  # stats stay corpus-wide -> identical scores
        assert r.score == pytest.approx(full[r.doc_id])


def test_snippets_window_and_clipping(idx):
    index, corpus = idx
    spark = corpus.sparkSession
    docs = spark.createDataFrame([(0,), (3,), (2,)], "doc_id long")
    got = {
        r.doc_id: r.snippet
        for r in Q.snippets(corpus, docs, ["window"], width=1).collect()
    }
    # doc 0: window at pos 2 -> merge window fast; doc 3: at pos 0
    # (start clipped) -> window sort; doc 2: no hit -> dropped
    assert got == {0: "merge window fast", 3: "window sort"}


def test_snippets_first_hit_of_any_term(idx):
    _, corpus = idx
    spark = corpus.sparkSession
    docs = spark.createDataFrame([(4,)], "doc_id long")
    got = Q.snippets(corpus, docs, ["window", "merge"], width=1).collect()
    # first hit of ANY term is merge at pos 2 -> spark merge merge
    assert got[0].snippet == "spark merge merge"


def test_facet_counts(idx):
    index, corpus = idx
    spark = corpus.sparkSession
    meta = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de"), (3, "en"), (4, "de")],
        "doc_id long, lang string",
    )
    hits = Q.search_or(index, ["merge"])  # docs 0,1,2,4
    got = {r.facet: r.n for r in Q.facet_counts(hits, meta, "lang").collect()}
    assert got == {"en": 2, "de": 2}
