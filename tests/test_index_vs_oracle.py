"""End-to-end: Spark engine vs pure-Python oracle on the tiny tier —
rank-identical docIDs AND scores (north rule), plus the reference
suite's golden assertions carried over (FIXTURES.md §1.2)."""

import math

import pytest

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import build_index, merge_segments
from peterman_search_engine_spark.oracle import OracleIndex

TOL = 1e-9

QUERIES = [
    ["cat"],
    ["cat", "dog"],
    ["apple", "apple", "rotten"],
    ["university"],
    ["kitten"],
    ["monkey", "dog"],
    ["nonexistenttermxyz"],
    ["the"],  # pure stop words -> empty analysis
    ["stemming", "computer"],
    ["partition", "shuffle", "merge"],
]


@pytest.fixture(scope="module")
def built(spark, tiny_corpus, tiny_corpus_rows):
    idx = build_index(tiny_corpus, stem=True, positional=True, docs_per_segment=16)
    idx.postings.cache().count()
    idx.doc_stats.cache().count()
    idx.term_stats.cache().count()
    oracle = OracleIndex(tiny_corpus_rows, stem=True)
    return idx, oracle


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_corpus_stats_match(built):
    idx, oracle = built
    assert idx.n_docs == oracle.n_docs
    assert abs(idx.avg_len - oracle.avg_len) < TOL


def test_term_stats_match(built):
    idx, oracle = built
    got = {r["term"]: (r["df"], r["cf"]) for r in idx.term_stats.collect()}
    want = {
        t: (len(p), sum(len(v) for v in p.values()))
        for t, p in oracle.postings.items()
    }
    assert got == want


def test_postings_sorted_and_match(built):
    idx, oracle = built
    rows = idx.postings.collect()
    # reconstruct global posting lists from segments
    by_term = {}
    for r in rows:
        assert r["doc_ids"] == sorted(r["doc_ids"]), "postings must be doc_id-sorted"
        by_term.setdefault(r["term"], []).extend(
            zip(r["doc_ids"], r["tfs"], [list(p) for p in r["positions"]])
        )
    for t, entries in by_term.items():
        entries.sort()
        want = sorted(
            (d, len(pos), pos) for d, pos in oracle.postings[t].items()
        )
        assert entries == want, f"postings mismatch for {t!r}"


def test_blob_roundtrip(built):
    from peterman_search_engine_spark.functions.codec import delta_varint_decode

    idx, _ = built
    for r in idx.postings.collect():
        assert delta_varint_decode(bytes(r["blob"])).tolist() == list(r["doc_ids"])
        assert len(r["block_starts"]) == len(r["block_ubs"])
        assert r["block_starts"][0] == r["doc_ids"][0]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: "+".join(q))
def test_and_search(built, q):
    idx, oracle = built
    assert _ids(Q.search_and(idx, q)) == oracle.search_and(q)


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: "+".join(q))
def test_or_search(built, q):
    idx, oracle = built
    assert _ids(Q.search_or(idx, q)) == oracle.search_or(q)


def test_keyword_empty_string(built):
    idx, _ = built
    # IIM:305-307 — empty string -> empty iterator
    assert _ids(Q.search_keyword(idx, "   ")) == []


PHRASES = [
    ["University", "of", "California", "Irvine"],  # Team12PhraseSearchTest
    ["cat", "dog"],
    ["rotten", "apple"],
    ["apple", "day"],  # stop word 'a' removed between -> consecutive
    ["nonexistent", "phrase"],
]


@pytest.mark.parametrize("q", PHRASES, ids=lambda q: "+".join(q))
def test_phrase_search(built, q):
    idx, oracle = built
    assert _ids(Q.search_phrase(idx, q)) == oracle.search_phrase(q)


RANKED = [
    (["apple", "apple", "rotten"], None),
    (["apple", "apple", "rotten"], 2),
    (["cat", "toy"], 3),
    (["university", "research"], 10),
    (["partition"], 5),
    (["nonexistenttermxyz"], 5),
]


def _assert_rank_identical(got_rows, want_pairs):
    got = [(r["doc_id"], r["score"]) for r in got_rows]
    assert [g[0] for g in got] == [w[0] for w in want_pairs]
    for (gd, gs), (wd, ws) in zip(got, want_pairs):
        assert math.isclose(gs, ws, rel_tol=TOL, abs_tol=TOL), (gd, gs, ws)


@pytest.mark.parametrize("q,k", RANKED, ids=lambda x: str(x))
def test_tfidf_rank_identical(built, q, k):
    idx, oracle = built
    got = Q.search_tfidf(idx, q, k).collect()
    _assert_rank_identical(got, oracle.search_tfidf(q, k))


@pytest.mark.parametrize("q,k", RANKED, ids=lambda x: str(x))
def test_bm25_rank_identical(built, q, k):
    idx, oracle = built
    got = Q.search_bm25(idx, q, k).collect()
    _assert_rank_identical(got, oracle.search_bm25(q, k))


def test_tfidf_scores_monotone_nonincreasing(built):
    # Team8TfIdfTest.java:50-87
    idx, _ = built
    rows = Q.search_tfidf(idx, ["apple", "apple", "rotten"], None).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) >= 2


def test_team8_ranked_order(built, tiny_corpus_rows):
    """Team8TfIdfTest.java:33-66 — for query [apple, apple, rotten] on
    the conv000002 corpus, 'One rotten apple spoils the whole barrel'
    outranks 'An apple a day...' which outranks 'Fortune knocks...'."""
    idx, _ = built
    texts = dict(tiny_corpus_rows)
    rows = Q.search_tfidf(idx, ["apple", "apple", "rotten"], None).collect()
    ranked_texts = [texts[r["doc_id"]] for r in rows]
    t_rotten = "One rotten apple spoils the whole barrel"
    t_apple = "An apple a day keeps a doctor away"
    t_fortune = "Fortune knocks once at everyone's rotten door"
    assert ranked_texts.index(t_rotten) < ranked_texts.index(t_apple)
    assert ranked_texts.index(t_apple) < ranked_texts.index(t_fortune)


def test_full_scan_oracle_matches_index(built, tiny_corpus):
    # Q13: FullScanSearcher is the reference's own debug oracle
    idx, _ = built
    for q in [["cat", "dog"], ["university"]]:
        assert _ids(Q.full_scan_search(tiny_corpus, q)) == _ids(Q.search_and(idx, q))


def test_merge_segments_preserves_queries(built):
    idx, oracle = built
    n0 = idx.num_segments()
    merged = merge_segments(idx, factor=2)
    assert merged.num_segments() == (n0 + 1) // 2
    # identical results post-merge (Team12MergeTest analogue)
    assert _ids(Q.search_and(merged, ["cat", "dog"])) == oracle.search_and(["cat", "dog"])
    got = Q.search_bm25(merged, ["apple", "rotten"], 5).collect()
    _assert_rank_identical(got, oracle.search_bm25(["apple", "rotten"], 5))
    # postings stay sorted after merge
    for r in merged.postings.collect():
        assert list(r["doc_ids"]) == sorted(r["doc_ids"])
