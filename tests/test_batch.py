"""Batch query execution == per-query execution, per qid."""

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators.batch import batch_bm25_topk
from peterman_search_engine_spark.operators.indexer import build_index
from peterman_search_engine_spark.operators.query import search_bm25


@pytest.fixture(scope="module")
def index(spark):
    rows = [
        (0, "apple banana cherry apple"),
        (1, "apple cherry cherry"),
        (2, "banana cherry date"),
        (3, "apple banana cherry date fig"),
        (4, "date fig grape"),
        (5, "grape apple grape"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(corpus, stem=False, positional=True, docs_per_segment=2)


def test_batch_equals_per_query(index):
    queries = {
        0: ["apple", "banana"],
        1: ["cherry"],
        2: ["grape", "grape"],        # query-tf multiplicity
        3: ["date", "fig", "apple"],
        4: ["absentterm"],            # no hits -> no rows for qid
    }
    got = batch_bm25_topk(index, queries, 3).collect()
    by_qid: dict[int, list] = {}
    for r in got:
        by_qid.setdefault(r["qid"], []).append(r)
    assert 4 not in by_qid
    for qid, terms in queries.items():
        want = search_bm25(index, terms, 3).collect()
        have = by_qid.get(qid, [])
        assert [r["doc_id"] for r in have] == [r["doc_id"] for r in want], qid
        for h, w in zip(have, want):
            assert h["score"] == pytest.approx(w["score"], rel=1e-12)


def test_batch_respects_tombstones(index, spark):
    from peterman_search_engine_spark.operators.maintenance import delete_documents

    tidx = delete_documents(index, spark.createDataFrame([(0,)], "doc_id long"))
    got = batch_bm25_topk(tidx, {0: ["apple"]}, 10).collect()
    assert 0 not in [r["doc_id"] for r in got]
    assert len(got) > 0
