"""Semantic unit tests for the round-3 query/analysis operators —
behaviors the DuckDB value-hash gate can't express: field boosting
actually reorders results, dictionary expansion matches the intended
term sets, the example doc is excluded, PMI prefers true collocations,
redaction handles real-world shapes.
"""

import math

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.functions.textstats import md5_long, redact_pii
from peterman_search_engine_spark.operators.collocations import bigram_pmi
from peterman_search_engine_spark.operators.indexer import build_index
from peterman_search_engine_spark.operators.query import (
    search_fuzzy,
    search_wildcard,
    suggest_terms,
)
from peterman_search_engine_spark.operators.ranking import (
    bm25f_scores,
    grouped_topk,
    more_like_this,
    search_bm25f,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 0: "apple" once, at the head; doc 1: "apple" twice, in the
    # body (pos >= 2 after the head window below); fillers keep doc
    # lengths equal so only field weighting separates them.
    rows = [
        (0, "apple row row row row row row row"),
        (1, "row row apple apple row row row row"),
        (2, "banana cherry banana cherry banana cherry kiwi plum"),
        (3, "grape grape melon melon melon grape kiwi plum"),
        (4, "apple banana unrelated words here kiwi plum pear"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, stem=False, positional=True, docs_per_segment=2)


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


# -- BM25F --------------------------------------------------------------------

def test_bm25f_head_boost_reorders(index):
    """Plain BM25 ranks doc 1 (tf=2) above doc 0 (tf=1); with a strong
    head boost and a 2-token head window, doc 0's head occurrence
    outweighs doc 1's two body occurrences."""
    from peterman_search_engine_spark.operators.query import bm25_scores

    plain = {r["doc_id"]: r["score"] for r in bm25_scores(index, ["apple"]).collect()}
    assert plain[1] > plain[0]
    fielded = search_bm25f(
        index, ["apple"], top_k=None, head_len=2, w_head=5.0, w_body=1.0
    )
    ids = _ids(fielded)
    assert ids.index(0) < ids.index(1)


def test_bm25f_uniform_weights_equal_bm25(index):
    """w_head == w_body == 1 degenerates to plain BM25 exactly."""
    from peterman_search_engine_spark.operators.query import bm25_scores

    plain = {r["doc_id"]: r["score"] for r in bm25_scores(index, ["apple"]).collect()}
    uni = {
        r["doc_id"]: r["score"]
        for r in bm25f_scores(index, ["apple"], head_len=3, w_head=1.0, w_body=1.0).collect()
    }
    assert set(uni) == set(plain)
    for d in plain:
        assert uni[d] == pytest.approx(plain[d], rel=1e-12)


def test_bm25f_requires_positions(corpus):
    idx = build_index(corpus, stem=False, positional=False, docs_per_segment=2)
    with pytest.raises(ValueError):
        bm25f_scores(idx, ["apple"])


# -- dictionary expansion -----------------------------------------------------

def test_fuzzy_matches_edit_ball(index):
    # "aple" -> apple (1 edit); nothing else in the dictionary is close
    ids = set(_ids(search_fuzzy(index, "aple", 1)))
    assert ids == {0, 1, 4}
    # distance 0 of a non-term matches nothing
    assert _ids(search_fuzzy(index, "aple", 0)) == []
    # blank -> empty
    assert _ids(search_fuzzy(index, "  ", 2)) == []


def test_wildcard(index):
    # b*a -> banana; *lum -> plum; literal-only pattern with no star
    # still works as exact LIKE
    assert set(_ids(search_wildcard(index, "b*a"))) == {2, 4}
    assert set(_ids(search_wildcard(index, "*lum"))) == {2, 3, 4}
    # all-star pattern is rejected as matching everything vacuously
    assert _ids(search_wildcard(index, "**")) == []


def test_expansion_cap_falls_back_to_distributed_plan(index):
    """VERDICT r3 #5: an adversarial pattern matching more dictionary
    terms than max_expansions must not materialize an unbounded driver
    list — the overflow branch keeps the predicate on the posting scan
    and returns the IDENTICAL doc set."""
    # '*a*' matches most of the fruit dictionary; cap of 1 forces the
    # distributed branch (collect is LIMIT(cap+1)-bounded)
    capped = set(_ids(search_wildcard(index, "*a*", max_expansions=1)))
    uncapped = set(_ids(search_wildcard(index, "*a*")))
    assert capped == uncapped and capped  # non-empty, equal
    fz_capped = set(_ids(search_fuzzy(index, "aple", 2, max_expansions=1)))
    fz_uncapped = set(_ids(search_fuzzy(index, "aple", 2)))
    assert fz_capped == fz_uncapped and fz_capped


def test_suggest_orders_by_df_then_term(index):
    rows = suggest_terms(index, "p", 10).collect()
    # pear df=1, plum df=3 -> plum first; ties break on term asc
    assert [r["term"] for r in rows] == ["plum", "pear"]
    assert [r["df"] for r in rows] == [3, 1]


# -- more-like-this -----------------------------------------------------------

def test_more_like_this_excludes_example_and_finds_neighbor(index, corpus):
    got = more_like_this(index, corpus, 0, max_terms=4, top_k=5)
    ids = _ids(got)
    assert 0 not in ids
    # doc 1 shares "apple"/"row" profile -> must rank first
    assert ids[0] == 1


# -- collocations ------------------------------------------------------------

def test_bigram_pmi_prefers_fixed_collocation(spark):
    # "new york" always adjacent; "red" and "car" co-occur but never
    # adjacently more than the floor -> top bigram is (new, york)
    rows = [(i, "new york " + ("red fish car " * 3)) for i in range(5)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    top = bigram_pmi(corpus, min_count=5, top_k=1, stem=False).collect()[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    # pmi of a deterministic pair: p(ab)=5/T2, p(a)=p(b)=5/T
    n_docs, toks_per_doc = 5, 11
    t1 = n_docs * toks_per_doc
    t2 = n_docs * (toks_per_doc - 1)
    want = math.log((5 / t2) / ((5 / t1) * (5 / t1)))
    assert top["pmi"] == pytest.approx(want, rel=1e-12)


def test_bigram_pmi_min_count(spark):
    corpus = spark.createDataFrame(
        [(0, "one two three")], "doc_id long, text string"
    )
    assert bigram_pmi(corpus, min_count=2, top_k=10).count() == 0


# -- redaction ----------------------------------------------------------------

def test_redact_pii_shapes(spark):
    rows = [
        (0, "mail me at a.b-c_d%e@sub.domain.org today"),
        (1, "call 415-555-0199 or 415-555-0200 now"),
        (2, "no pii here"),
        (3, "not-a-phone 1234-555-0199 stays"),  # 4-digit prefix: \b fails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()
    }
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "no pii here"
    assert got[3] == "not-a-phone 1234-555-0199 stays"


# -- grouped retrieval ---------------------------------------------------------

def test_grouped_topk_sums_members(spark, index, corpus):
    meta = spark.createDataFrame(
        [(0, "conv_a"), (1, "conv_a"), (2, "conv_b"), (3, "conv_b"), (4, "conv_c")],
        "doc_id long, source string",
    )
    from peterman_search_engine_spark.operators.query import bm25_scores

    per_doc = {r["doc_id"]: r["score"] for r in bm25_scores(index, ["apple"]).collect()}
    rows = grouped_topk(index, ["apple"], meta, "source", None).collect()
    got = {r["group"]: (r["n_docs"], r["score"]) for r in rows}
    assert got["conv_a"][0] == 2
    assert got["conv_a"][1] == pytest.approx(per_doc[0] + per_doc[1], rel=1e-12)
    assert got["conv_c"] == (1, pytest.approx(per_doc[4], rel=1e-12))
    # ranked by summed score: conv_a (two hits) first
    assert rows[0]["group"] == "conv_a"
