"""Proximity (WITHIN-slop) search semantics — operators/query.py
search_proximity.

Hand-built docs pin the contract exactly:

* window is [a, a+slop] over FILTERED token positions (stop words
  shift positions, same as phrase);
* unordered — either term may come first;
* slop boundary is inclusive; span slop+1 tokens does not match;
* single term reduces to keyword semantics;
* raw-array and compressed/partial-decode plans agree.
"""

import dataclasses

import pytest

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import build_index


DOCS = [
    # positions (after analysis, no stopwords among these):
    (0, "alpha beta"),                       # adjacent, span 1
    (1, "beta alpha"),                       # reversed, span 1
    (2, "alpha filler filler filler beta"),  # span 4
    (3, "alpha filler filler filler filler beta"),  # span 5
    (4, "alpha gamma"),                      # beta absent
    (5, "beta gamma"),                       # alpha absent
    (6, "alpha the beta"),                   # 'the' is a stop word ->
    #                                          filtered span is 1
]


@pytest.fixture(scope="module")
def prox_index(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(corpus, stem=False, positional=True, docs_per_segment=4)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_slop_boundary_inclusive(prox_index):
    assert _ids(Q.search_proximity(prox_index, ["alpha", "beta"], 4)) == [
        0, 1, 2, 6,
    ]
    # widen by one: doc 3 (span 5) enters
    assert _ids(Q.search_proximity(prox_index, ["alpha", "beta"], 5)) == [
        0, 1, 2, 3, 6,
    ]


def test_unordered_and_slop1_superset_of_phrase(prox_index):
    got = _ids(Q.search_proximity(prox_index, ["alpha", "beta"], 1))
    assert got == [0, 1, 6]  # includes the reversed doc 1
    phrase = _ids(Q.search_phrase(prox_index, ["alpha", "beta"]))
    assert set(phrase) <= set(got)


def test_stopword_shifts_positions(prox_index):
    # doc 6 text spans 3 raw tokens but 2 filtered ones
    assert 6 in _ids(Q.search_proximity(prox_index, ["alpha", "beta"], 1))


def test_single_term_matches_keyword(prox_index):
    assert _ids(Q.search_proximity(prox_index, ["alpha"], 0)) == _ids(
        Q.search_and(prox_index, ["alpha"])
    )


def test_slop_zero_multi_term_is_empty(prox_index):
    # two distinct terms can never share one position
    assert _ids(Q.search_proximity(prox_index, ["alpha", "beta"], 0)) == []


def test_partial_decode_plan_agrees(prox_index):
    idx2 = dataclasses.replace(
        prox_index, postings=prox_index.postings.drop("positions")
    )
    for slop in (1, 4, 5):
        assert _ids(Q.search_proximity(idx2, ["alpha", "beta"], slop)) == _ids(
            Q.search_proximity(prox_index, ["alpha", "beta"], slop)
        )


def test_validation(prox_index):
    with pytest.raises(ValueError):
        Q.search_proximity(prox_index, ["alpha"], -1)
