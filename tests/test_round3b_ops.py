"""Semantic unit tests for the round-3b operators: LM-Dirichlet
ranking (closed-form decomposition vs the direct formula), hybrid
RRF fusion (rank arithmetic, tie determinism, query exclusion),
whole-term regex search (anchoring, tf ranking), and the Gopher-style
repetition fractions (exact hand-computed values, edge cases).

The DuckDB value-hash gate (tests/test_entry_vs_duckdb.py) covers the
same operators end-to-end against SQL oracles; these tests pin the
MATH so a matching-but-wrong pair of implementations can't slip by.
"""

import math

import pytest

from peterman_search_engine_spark.functions.textstats import (
    dup_bigram_fraction,
    dup_word_fraction,
)
from peterman_search_engine_spark.operators.indexer import build_index
from peterman_search_engine_spark.operators.query import search_regex
from peterman_search_engine_spark.operators.ranking import (
    hybrid_rrf_topk,
    lm_dirichlet_scores,
    search_lm_dirichlet,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # fruit words only — none are stop words, so analyzed doc length
    # equals the whitespace word count and the hand math below is exact
    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple banana"),
        (2, "cherry plum kiwi"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, stem=False, positional=True, docs_per_segment=2)


MU = 10.0


def _lm_direct(tfs: dict[str, int], doc_len: int, pcs: dict[str, float]) -> float:
    """The textbook (un-decomposed) Dirichlet query likelihood."""
    return sum(
        math.log((tfs.get(t, 0) + MU * pc) / (doc_len + MU))
        for t, pc in pcs.items()
    )


def test_lm_dirichlet_matches_direct_formula(index):
    got = {
        r["doc_id"]: r["score"]
        for r in lm_dirichlet_scores(index, ["apple", "banana"], mu=MU).collect()
    }
    # C = 9 tokens; cf: apple 3, banana 2
    pcs = {"apple": 3 / 9, "banana": 2 / 9}
    want = {
        0: _lm_direct({"apple": 1, "banana": 1}, 3, pcs),
        1: _lm_direct({"apple": 2, "banana": 1}, 3, pcs),
    }
    assert set(got) == set(want)  # doc 2 matches neither term
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    assert got[1] > got[0]  # higher tf wins at equal length


def test_lm_dirichlet_drops_unseen_terms(index):
    # 'durian' has cf=0: it must not blow up the closed form, and a
    # query of only unseen terms is empty
    both = {
        r["doc_id"]: r["score"]
        for r in lm_dirichlet_scores(index, ["apple", "durian"], mu=MU).collect()
    }
    only = {
        r["doc_id"]: r["score"]
        for r in lm_dirichlet_scores(index, ["apple"], mu=MU).collect()
    }
    assert both == only
    assert search_lm_dirichlet(index, ["durian"], 5).count() == 0


def test_hybrid_rrf_tie_break_and_exclusion(spark, index):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # the query vector itself — excluded
            (1, [0.9, 0.1]),   # vector side rank 1
            (2, [0.0, 1.0]),   # vector side rank 2 (cos 0)
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_rrf_topk(
        index, emb, ["apple"], [1.0, 0.0], k=5, n_each=10, exclude_ids=[0]
    ).collect()
    # lexical: doc 1 (tf 2) rank 1, doc 0 rank 2; vector: doc 1 rank 1,
    # doc 2 rank 2. doc 0 never enters the vector list, doc 2 never the
    # lexical one.
    got = {r["doc_id"]: r["rrf_e6"] for r in out}
    assert got[1] == round((1 / 61 + 1 / 61) * 1e6)
    assert got[0] == round(1 / 62 * 1e6)
    assert got[2] == round(1 / 62 * 1e6)
    # docs 0 and 2 tie exactly -> doc_id ascending breaks it
    order = [r["doc_id"] for r in out]
    assert order == [1, 0, 2]


def test_regex_whole_term_anchoring(spark):
    corpus = spark.createDataFrame(
        [
            (0, "apple apples application banana"),
            (1, "apple apple banana banana"),
            (2, "banana plum"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(corpus, stem=False, positional=False, docs_per_segment=10)
    rows = search_regex(idx, "appl[a-z]*").collect()
    got = {r["doc_id"]: (r["n_terms"], r["tf_sum"]) for r in rows}
    assert got == {0: (3, 3), 1: (1, 2)}  # doc 2 has no appl* term
    # anchored: the pattern must match the WHOLE term
    assert search_regex(idx, "appl").count() == 0
    # ranking: tf_sum desc, then n_terms desc, then doc_id
    assert [r["doc_id"] for r in rows] == [0, 1]


@pytest.mark.parametrize(
    "text,dw,db",
    [
        ("a a b", 1 / 3, 0.0),               # bigrams 'a a','a b' distinct
        ("x y x y x y", 2 / 3, 3 / 5),       # 5 bigrams, 2 distinct
        ("one two three", 0.0, 0.0),
        ("solo", 0.0, 0.0),                  # <2 words: no bigrams
        ("", 0.0, 0.0),
        ("  Tab\tand   space  ", 0.0, 0.0),  # whitespace runs collapse
    ],
)
def test_repetition_fractions(spark, text, dw, db):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            dup_word_fraction(F.col("text")).alias("w"),
            dup_bigram_fraction(F.col("text")).alias("b"),
        )
        .collect()[0]
    )
    assert row["w"] == pytest.approx(dw, abs=1e-12)
    assert row["b"] == pytest.approx(db, abs=1e-12)


def test_curation_pipeline_composition(spark):
    from peterman_search_engine_spark.operators.curation import curation_pipeline

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog by the green river", "a"),
            (1, "the quick brown fox jumps over the lazy dog by the green river", "a"),
            (2, "!!! ,,, ;;;", "a"),  # quality below the floor
            (3, "alpha beta gamma delta epsilon zeta", "b"),  # contaminated
            (4, "many people think spark clusters shuffle data quite efficiently", "b"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta unrelated", "x")],
        "doc_id long, text string, source string",
    )
    got = curation_pipeline(
        corpus,
        bench,
        strata_col="source",
        rates={},          # default_rate 1.0: sampling keeps everything
        quality_min_e6=300_000,
        min_overlap=2,
    ).collect()
    # doc 1 is an exact dup of 0 (min-id survives), 2 fails the quality
    # floor, 3 shares >= 2 shingles with the benchmark
    assert {(r["doc_id"], r["source"]) for r in got} == {(0, "a"), (4, "b")}


def test_lsh_multiprobe_radius_semantics(spark):
    from peterman_search_engine_spark.operators.similarity import (
        NUM_PLANES,
        cosine_topk,
        lsh_bucketed_topk,
        lsh_multiprobe_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]

    def ids(df):
        return [r["vec_id"] for r in df.collect()]

    # radius 0 == the single-bucket probe
    assert ids(
        lsh_multiprobe_topk(emb, qv, radius=0, exclude_ids=[0])
    ) == ids(lsh_bucketed_topk(emb, qv, exclude_ids=[0]))
    # radius == num_planes degenerates to brute force
    assert ids(
        lsh_multiprobe_topk(emb, qv, radius=NUM_PLANES, exclude_ids=[0])
    ) == ids(cosine_topk(emb, qv, exclude_ids=[0]))
    # recall vs brute force is non-decreasing in radius (candidate set
    # only grows)
    exact = set(ids(cosine_topk(emb, qv, exclude_ids=[0])))
    last = -1.0
    for r in (0, 2, 4, NUM_PLANES):
        rec = len(exact & set(ids(lsh_multiprobe_topk(emb, qv, radius=r, exclude_ids=[0])))) / len(exact)
        assert rec >= last
        last = rec
    assert last == 1.0


def test_bm25_keyset_pagination(index):
    from peterman_search_engine_spark.operators.query import (
        search_bm25,
        search_bm25_page,
    )

    full = [r["doc_id"] for r in search_bm25(index, ["apple"], None).collect()]
    assert len(full) == 2
    p1 = search_bm25_page(index, ["apple"], 1).collect()
    cur = (p1[-1]["score_e6"], p1[-1]["doc_id"])
    p2 = search_bm25_page(index, ["apple"], 1, cursor=cur).collect()
    cur2 = (p2[-1]["score_e6"], p2[-1]["doc_id"])
    p3 = search_bm25_page(index, ["apple"], 1, cursor=cur2).collect()
    assert [r["doc_id"] for r in p1 + p2] == full  # pages tile the ranking
    assert p3 == []                                # past the end: empty


def test_rank_eval_hand_computed(spark):
    import math

    from peterman_search_engine_spark.operators.evaluation import rank_eval

    runs = spark.createDataFrame(
        [
            (0, 2, 1), (0, 7, 2), (0, 3, 3),   # rel hits at ranks 1 and 3
            (1, 4, 1), (1, 9, 2),              # first rel at rank 2
            (2, 8, 1),                          # no rel retrieved
        ],
        "qid int, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 9), (2, 5)],
        "qid int, doc_id long",
    )
    got = {r["qid"]: r for r in rank_eval(runs, qrels, k=3).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["n_rel"] == 3 and got[1]["n_rel"] == 1 and got[2]["n_rel"] == 1

    dcg0 = 1 / math.log2(2) + 1 / math.log2(4)
    idcg0 = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert got[0]["mrr_e6"] == round(1.0 * 1e6)
    assert got[0]["ndcg_e6"] == round(dcg0 / idcg0 * 1e6)
    assert got[1]["mrr_e6"] == round(0.5 * 1e6)
    assert got[1]["ndcg_e6"] == round((1 / math.log2(3)) / 1.0 * 1e6)
    assert got[2]["mrr_e6"] == 0 and got[2]["ndcg_e6"] == 0
