"""Reference deletion-suite conformance
(TEST/index/inverted/InvertedIndexDeletionTest.java:56-205): the four
keyword-deletion shapes replayed against tombstones AND the compacted
index.

Reference semantics vs ours (documented divergence): the reference's
``deleteDocuments`` only MARKS docs, and its documentIterator keeps
returning them until mergeAllSegments applies the deletion
(InvertedIndexDeletionTest.java:60-71 asserts 8 docs pre-merge). Our
tombstones take effect IMMEDIATELY in every query (the Lucene liveDocs
model, operators/maintenance.py) — strictly stronger, so we assert the
reference's POST-merge expectations against both our tombstone view and
the compacted index, and its segment counts after renumber + pair-merge
(the reference's merge renames segment files to close the gaps deleted
segments leave, InvertedIndexManager.java:1062-1131).
"""

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import (
    build_index,
    merge_segments,
)
from peterman_search_engine_spark.operators.maintenance import (
    compact_deletes,
    delete_documents,
    renumber_segments,
)

# InvertedIndexDeletionTest.java:32-47 — the 8-doc corpus, one doc per
# flush (= one per segment); analyzer = PunctuationTokenizer +
# PorterStemmer (line 23) -> stem=True here.
DOCS = [
    (0, "cat dog toy"),
    (1, "cat Dot"),
    (2, "cat dot toy"),
    (3, "cat toy Dog"),
    (4, "toy dog cat"),
    (5, "cat Dog"),
    (6, "fish cat"),
    (7, "cat bird"),
]


def _index(spark, docs_per_segment):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(
        corpus, stem=True, positional=True, docs_per_segment=docs_per_segment
    )


def _delete_by_keyword(index, keyword):
    # the reference's deleteDocuments(keyword): tombstone every doc
    # whose analyzed tokens contain analyze(keyword)
    return delete_documents(index, Q.search_keyword(index, keyword))


def _live_ids(index):
    live = index.doc_stats
    if index.tombstones is not None:
        live = live.join(index.tombstones, "doc_id", "left_anti")
    return sorted(r["doc_id"] for r in live.select("doc_id").collect())


def _n_segments(index):
    return index.postings.select("segment").distinct().count()


def _hits(index, kw):
    return sorted(r["doc_id"] for r in Q.search_keyword(index, kw).collect())


# Java test name, docs/segment, keyword, expected live ids, expected
# segment count after (compact + renumber + pair-merge) — the
# reference's post-mergeAllSegments numbers.
CASES = [
    # Test1 (java:56-86): delete 'dog' -> 4 live docs, 2 segments
    ("Test1", 1, "dog", [1, 2, 6, 7], 2),
    # Test2 (java:88-120): unknown keyword -> nothing deleted, 8 docs,
    # 8 segments pair-merge to 4
    ("Test2", 1, "elephant", [0, 1, 2, 3, 4, 5, 6, 7], 4),
    # Test3 (java:122-154): keyword in ALL docs -> empty index,
    # 0 segments
    ("Test3", 1, "cat", [], 0),
    # Test4 (java:157-205): 2 docs per segment (4 segments), delete
    # 'dog' -> live segments {0,1,3} renumber+pair-merge to 2
    ("Test4", 2, "dog", [1, 2, 6, 7], 2),
]


@pytest.mark.parametrize("name,dps,kw,live,nseg", CASES, ids=[c[0] for c in CASES])
def test_deletion_conformance(spark, name, dps, kw, live, nseg):
    idx = _index(spark, dps)

    tombed = _delete_by_keyword(idx, kw)
    # tombstone view: deleted docs invisible to queries immediately
    # (our liveDocs divergence — the reference defers to merge)
    assert _live_ids(tombed) == live
    assert _hits(tombed, kw) == []
    # the keyword delete caught case-folded + stemmed forms ('Dog')
    deleted = sorted(set(range(8)) - set(live))
    if tombed.tombstones is not None:
        assert sorted(
            r["doc_id"] for r in tombed.tombstones.collect()
        ) == deleted

    # compacted view: physically removed (java asserts post-merge)
    compacted = compact_deletes(tombed)
    assert compacted.tombstones is None
    assert compacted.n_docs == len(live)
    assert _live_ids(compacted) == live
    assert _hits(compacted, kw) == []
    # surviving docs still fully searchable with correct postings
    if live:
        assert _hits(compacted, "cat") == live  # every doc has 'cat'

    # segment count after renumber + pair-merge == the reference's
    # post-mergeAllSegments count (java:73,107,141,192)
    if compacted.n_docs:
        merged = merge_segments(renumber_segments(compacted), factor=2)
    else:
        merged = compacted  # nothing left to merge (java Test3: 0)
    assert _n_segments(merged) == nseg
    # the merged index answers queries identically
    assert _hits(merged, "cat") == live
    assert _hits(merged, kw) == []


def test_post_compaction_scoring_matches_reduced_corpus(spark):
    """After compaction the index must be indistinguishable from one
    built on the reduced corpus: identical BM25 scores (df, N, avg_len
    all recomputed) — the 'beyond the stub' guarantee the tombstone
    view intentionally relaxes."""
    idx = _index(spark, 1)
    compacted = compact_deletes(_delete_by_keyword(idx, "dog"))
    reduced = spark.createDataFrame(
        [d for d in DOCS if d[0] in (1, 2, 6, 7)], "doc_id long, text string"
    )
    rebuilt = build_index(reduced, stem=True, positional=True, docs_per_segment=1)
    got = {
        (r["doc_id"], round(r["score"], 9))
        for r in Q.bm25_scores(compacted, ["toy", "fish"]).collect()
    }
    want = {
        (r["doc_id"], round(r["score"], 9))
        for r in Q.bm25_scores(rebuilt, ["toy", "fish"]).collect()
    }
    assert got == want and got
