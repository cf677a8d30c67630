"""Round-4 operators: ordered span-near, spelling correction, RM3
pseudo-relevance feedback, and upsert-reindex. The sf-scale value gates
run through test_entry_vs_duckdb (span_near_search / spell_correct /
prf_bm25_topk / upsert_bm25_topk); these are the semantic unit tests."""

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import build_index
from peterman_search_engine_spark.operators.maintenance import upsert_documents
from peterman_search_engine_spark.operators.ranking import search_rm3


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha x beta"),           # alpha..beta gap 2
        (2, "beta alpha"),             # wrong order
        (3, "alpha x y z beta"),       # gap 4
        (4, "alpha beta alpha beta"),
        (5, "gamma delta epsilon"),
        (6, "alpha gamma beta zeta"),  # gap 2 via gamma
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, stem=False, positional=True, docs_per_segment=3)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


# -- ordered span-near ---------------------------------------------------------

def test_span_near_orders_and_gaps(index):
    # gap 1 == strict phrase
    assert _ids(Q.search_span_near(index, ["alpha", "beta"], 1)) == [0, 4]
    # gap 2 admits one intervening token, still ordered
    assert _ids(Q.search_span_near(index, ["alpha", "beta"], 2)) == [0, 1, 4, 6]
    # gap 4 reaches doc 3; doc 2 (wrong order) never matches
    assert _ids(Q.search_span_near(index, ["alpha", "beta"], 4)) == [0, 1, 3, 4, 6]
    # three terms chained in order
    assert _ids(Q.search_span_near(index, ["alpha", "beta", "gamma"], 2)) == [0]
    # degenerate single term -> containment
    assert _ids(Q.search_span_near(index, ["epsilon"], 3)) == [5]
    with pytest.raises(ValueError):
        Q.search_span_near(index, ["alpha", "beta"], 0)


def test_span_near_pathological_doc(spark):
    # Worst case for a nested per-position exists chain: one token
    # repeated L times means ~L·2^(m-1) backtracking paths, each paying
    # an O(L) array scan — super-linear blowup. The level-wise
    # feasible-set merge is O(Σ|positions|·log) per candidate, so this
    # must finish in seconds AND be exact.
    import time

    L = 20_000
    rows = [
        # doc 0: L×"aa" then filler then "bb" far beyond any gap-2
        # chain — every 5-step chain of "aa" succeeds, the final "bb"
        # step always fails => the old plan explores ~all chains.
        (0, " ".join(["aa"] * L) + " " + " ".join(["cc"] * 10) + " bb"),
        # doc 1: same spam prefix but "bb" adjacent — must match.
        (1, " ".join(["aa"] * L) + " bb"),
        (2, "aa bb cc"),
    ]
    idx = build_index(
        spark.createDataFrame(rows, "doc_id long, text string"),
        stem=False, positional=True, docs_per_segment=2,
    )
    q = ["aa", "aa", "aa", "aa", "aa", "bb"]
    t0 = time.perf_counter()
    got = _ids(Q.search_span_near(idx, q, 2))
    wall = time.perf_counter() - t0
    assert got == [1]
    # repeated-token self-query: any 6-chain of consecutive "aa"
    assert _ids(Q.search_span_near(idx, ["aa"] * 6, 1)) == [0, 1]
    assert wall < 60, wall  # linear-ish; the nested chain never returns


def test_span_near_requires_positions(corpus):
    idx = build_index(corpus, stem=False, positional=False, docs_per_segment=3)
    with pytest.raises(ValueError):
        Q.search_span_near(idx, ["alpha", "beta"], 2)


# -- spelling correction -------------------------------------------------------

def test_suggest_spelling_ranks_dist_then_df(index):
    rows = Q.suggest_spelling(index, "alpa", max_dist=2, top_k=5).collect()
    terms = [r["term"] for r in rows]
    assert terms[0] == "alpha"  # distance 1 beats any distance 2
    assert all(r["dist"] <= 2 for r in rows)
    # a correctly-spelled term suggests alternatives, never itself
    rows2 = Q.suggest_spelling(index, "beta", max_dist=2, top_k=5).collect()
    assert "beta" not in [r["term"] for r in rows2]
    # blank -> empty
    assert Q.suggest_spelling(index, "  ").count() == 0


# -- RM3 pseudo-relevance feedback ---------------------------------------------

def test_rm3_expands_with_cooccurring_terms(spark):
    # 'alpha' docs consistently co-occur with 'omega'; a doc containing
    # ONLY omega is unreachable by the raw query but surfaces after
    # expansion.
    rows = [(i, "alpha omega filler") for i in range(6)]
    rows += [(6, "omega solo text"), (7, "unrelated words here")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(corpus, stem=False, positional=False, docs_per_segment=4)
    raw = _ids(Q.search_bm25(idx, ["alpha"], None))
    assert 6 not in raw
    expanded = _ids(
        search_rm3(idx, corpus, ["alpha"], fb_docs=3, fb_terms=2, top_k=None)
    )
    assert 6 in expanded
    # original terms keep weight 1.0: alpha docs still outrank the
    # expansion-only doc
    top = search_rm3(idx, corpus, ["alpha"], fb_docs=3, fb_terms=2, top_k=1)
    assert top.collect()[0]["doc_id"] in set(range(6))


def test_rm3_empty_query(spark, index, corpus):
    assert search_rm3(index, corpus, ["the"], top_k=5).count() == 0


# -- upsert-reindex ------------------------------------------------------------

def test_upsert_equals_fresh_rebuild(spark, corpus):
    idx = build_index(corpus, stem=False, positional=True, docs_per_segment=3)
    updated = spark.createDataFrame(
        [(1, "omega rewrite alpha"), (5, "gamma delta epsilon omega")],
        "doc_id long, text string",
    )
    up = upsert_documents(idx, updated, docs_per_segment=3)
    fresh_rows = [
        (0, "alpha beta gamma delta"),
        (1, "omega rewrite alpha"),
        (2, "beta alpha"),
        (3, "alpha x y z beta"),
        (4, "alpha beta alpha beta"),
        (5, "gamma delta epsilon omega"),
        (6, "alpha gamma beta zeta"),
    ]
    fresh = build_index(
        spark.createDataFrame(fresh_rows, "doc_id long, text string"),
        stem=False, positional=True, docs_per_segment=3,
    )
    assert up.n_docs == fresh.n_docs
    assert up.avg_len == pytest.approx(fresh.avg_len, rel=1e-12)
    for terms in (["omega"], ["alpha", "beta"], ["epsilon", "omega"]):
        got = {
            (r["doc_id"], round(r["score"], 9))
            for r in Q.bm25_scores(up, terms).collect()
        }
        want = {
            (r["doc_id"], round(r["score"], 9))
            for r in Q.bm25_scores(fresh, terms).collect()
        }
        assert got == want, terms
    # term stats post-upsert exact
    got_ts = {
        (r["term"], r["df"], r["cf"]) for r in up.term_stats.collect()
    }
    want_ts = {
        (r["term"], r["df"], r["cf"]) for r in fresh.term_stats.collect()
    }
    assert got_ts == want_ts
    # positional structures survive the upsert (phrase over new text)
    assert _ids(Q.search_phrase(up, ["omega", "rewrite"])) == [1]


def test_upsert_honors_preexisting_tombstones(spark, corpus):
    # An upsert on an index that already carries tombstones must NOT
    # resurrect the deleted docs: the result equals a fresh rebuild on
    # (corpus - deleted + updated).
    from peterman_search_engine_spark.operators.maintenance import (
        delete_documents,
    )

    idx = build_index(corpus, stem=False, positional=True, docs_per_segment=3)
    idx = delete_documents(idx, [2, 5])
    updated = spark.createDataFrame(
        [(1, "omega rewrite alpha")], "doc_id long, text string"
    )
    up = upsert_documents(idx, updated, docs_per_segment=3)
    fresh_rows = [
        (0, "alpha beta gamma delta"),
        (1, "omega rewrite alpha"),
        (3, "alpha x y z beta"),
        (4, "alpha beta alpha beta"),
        (6, "alpha gamma beta zeta"),
    ]
    fresh = build_index(
        spark.createDataFrame(fresh_rows, "doc_id long, text string"),
        stem=False, positional=True, docs_per_segment=3,
    )
    assert up.n_docs == fresh.n_docs == 5
    assert up.avg_len == pytest.approx(fresh.avg_len, rel=1e-12)
    # deleted docs stay gone from stats AND from query results
    assert _ids(up.doc_stats.select("doc_id")) == [0, 1, 3, 4, 6]
    assert _ids(Q.search_keyword(up, "epsilon")) == []  # only doc 5 had it
    assert 2 not in _ids(Q.search_keyword(up, "beta"))
    for terms in (["omega"], ["alpha", "beta"], ["gamma"]):
        got = {
            (r["doc_id"], round(r["score"], 9))
            for r in Q.bm25_scores(up, terms).collect()
        }
        want = {
            (r["doc_id"], round(r["score"], 9))
            for r in Q.bm25_scores(fresh, terms).collect()
        }
        assert got == want, terms
    got_ts = {(r["term"], r["df"], r["cf"]) for r in up.term_stats.collect()}
    want_ts = {
        (r["term"], r["df"], r["cf"]) for r in fresh.term_stats.collect()
    }
    assert got_ts == want_ts


def test_upsert_dedupes_updated_doc_ids(spark, corpus):
    # Duplicate doc_ids in `updated` must collapse to one row per id —
    # n_docs/avg_len/df/cf are NOT inflated by the duplicates.
    idx = build_index(corpus, stem=False, positional=True, docs_per_segment=3)
    updated = spark.createDataFrame(
        [
            (1, "omega rewrite alpha"),
            (1, "omega rewrite alpha"),
            (1, "omega rewrite alpha"),
        ],
        "doc_id long, text string",
    )
    up = upsert_documents(idx, updated, docs_per_segment=3)
    assert up.n_docs == idx.n_docs  # pure replace, no growth
    assert _ids(up.doc_stats.select("doc_id")) == [0, 1, 2, 3, 4, 5, 6]
    om = up.term_stats.filter(F.col("term") == "omega").collect()
    assert [(r["df"], r["cf"]) for r in om] == [(1, 1)]
    assert _ids(Q.search_keyword(up, "omega")) == [1]


def test_upsert_pure_insert(spark, corpus):
    idx = build_index(corpus, stem=False, positional=True, docs_per_segment=3)
    new_docs = spark.createDataFrame(
        [(100, "brand new document omega")], "doc_id long, text string"
    )
    up = upsert_documents(idx, new_docs, docs_per_segment=3)
    assert up.n_docs == idx.n_docs + 1
    assert _ids(Q.search_keyword(up, "omega")) == [100]
    # existing docs unaffected
    assert _ids(Q.search_keyword(up, "epsilon")) == [5]
