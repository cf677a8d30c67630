"""Streaming upserts: a re-sent conv_id supersedes its old turns in
the micro-batch path (streaming/incremental.py), immediately at query
time (tombstones + exact live stats) and exactly after compaction
(fresh-rebuild equivalence — the same contract as the batch
maintenance.upsert_documents). The reference has no update path at all
(segments immutable, deleteDocuments a stub,
InvertedIndexManager.java:483-484)."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators.indexer import build_index
from peterman_search_engine_spark.operators.query import search_bm25, search_keyword
from peterman_search_engine_spark.operators.wand import bm25_topk_wand
from peterman_search_engine_spark.streaming.incremental import (
    fold_stats,
    ingest_batch,
    load_streaming_index,
    reencode_blocks,
    start_incremental_build,
)

B0 = [
    ("ca", 0, "unique alpha engine"),
    ("cb", 0, "beta engine shared words"),
    ("cc", 0, "gamma engine old payload"),
]
# cc re-sent (now TWO turns, different text) + a brand-new conv
B1 = [
    ("cc", 0, "gamma engine new payload"),
    ("cc", 1, "second turn fresh words"),
    ("cd", 0, "delta engine"),
]
# cc re-sent AGAIN (back to one turn) — the double-count trap
B2 = [
    ("cc", 0, "gamma engine final form"),
]

LIVE_AFTER_B1 = [t for c, _, t in B0 if c != "cc"] + [t for _, _, t in B1]
LIVE_AFTER_B2 = (
    [t for c, _, t in B0 if c != "cc"]
    + [t for c, _, t in B1 if c != "cc"]
    + [t for _, _, t in B2]
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def _fresh(spark, texts):
    return build_index(
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        ),
        stem=False, positional=True, docs_per_segment=2,
    )


def _by_text(spark, index_dir, result_df, batches):
    """(text, score) rows for a streaming-index ranked result — doc_ids
    are internal, so equivalence checks key on the conv turn's text via
    the conv→doc map. ``batches`` must list the ingested batches in
    order so a re-sent (conv, turn) resolves to its LIVE text."""
    dm = spark.read.option(
        "basePath", os.path.join(index_dir, "doc_map")
    ).parquet(os.path.join(index_dir, "doc_map"))
    texts = {(c, t): x for rows in batches for c, t, x in rows}
    rows = result_df.join(dm, "doc_id").select(
        "conv_id", "turn_idx", "score"
    ).collect()
    return sorted(
        (texts[(r["conv_id"], r["turn_idx"])], round(r["score"], 9))
        for r in rows
    )


def _scores_by_text(index, texts, terms, k=10):
    got = search_bm25(index, terms, k).collect()
    return sorted((texts[r["doc_id"]], round(r["score"], 9)) for r in got)


@pytest.fixture()
def upserted_dir(spark, tmp_path):
    d = str(tmp_path / "sidx_upsert")
    for i, rows in enumerate([B0, B1]):
        ingest_batch(
            _df(spark, rows), d, i,
            stem=False, positional=True, docs_per_segment=2,
        )
    return d


def test_resend_supersedes_before_compaction(spark, upserted_dir):
    idx = load_streaming_index(spark, upserted_dir)
    assert idx.tombstones is not None
    # the old cc turn is gone from every query surface, the new ones hit
    assert search_keyword(idx, "old").count() == 0
    got = [r["doc_id"] for r in search_keyword(idx, "new").collect()]
    assert len(got) == 1
    # live stats are exact (manifest fold: 3 - 1 superseded + 3 = 5)
    assert idx.n_docs == 5
    want_avg = sum(len(t.split()) for t in LIVE_AFTER_B1) / 5
    assert abs(idx.avg_len - want_avg) < 1e-9
    # ranked results never surface the superseded doc
    texts = [t for _, _, t in B0 + B1]
    hits = {r["doc_id"] for r in search_bm25(idx, ["engine"], 10).collect()}
    assert all("old" not in texts[d] for d in hits)
    # replaying an already-committed batch is a no-op
    ingest_batch(
        _df(spark, B1), upserted_dir, 1,
        stem=False, positional=True, docs_per_segment=2,
    )
    assert load_streaming_index(spark, upserted_dir).n_docs == 5


def test_compaction_equals_fresh_rebuild(spark, upserted_dir):
    reencode_blocks(spark, upserted_dir)
    idx = load_streaming_index(spark, upserted_dir)
    assert idx.tombstones is None
    fresh = _fresh(spark, LIVE_AFTER_B1)
    assert idx.n_docs == fresh.n_docs
    assert abs(idx.avg_len - fresh.avg_len) < 1e-9
    # df/cf drift is gone: exact term_stats equality
    a = sorted(map(tuple, idx.term_stats.collect()))
    b = sorted(map(tuple, fresh.term_stats.collect()))
    assert a == b
    for terms in (["engine"], ["payload"], ["words", "fresh"]):
        want = _scores_by_text(fresh, LIVE_AFTER_B1, terms)
        got = _by_text(
            spark, upserted_dir, search_bm25(idx, terms, 10), [B0, B1]
        )
        assert got == want, terms
    # WAND (forced through the pruned plan) agrees too
    want = _scores_by_text(fresh, LIVE_AFTER_B1, ["engine"])
    got = _by_text(
        spark, upserted_dir,
        bm25_topk_wand(idx, ["engine"], 10, force_prune=True), [B0, B1],
    )
    assert got == want


def test_third_resend_after_compaction_no_double_count(spark, upserted_dir):
    reencode_blocks(spark, upserted_dir)
    ingest_batch(
        _df(spark, B2), upserted_dir, 2,
        stem=False, positional=True, docs_per_segment=2,
    )
    # cc had 2 live turns after B1; B2 replaces them with 1 → 5-2+1=4
    st = fold_stats(upserted_dir)
    assert st["n_docs"] == 4
    idx = load_streaming_index(spark, upserted_dir)
    assert idx.n_docs == 4
    want_avg = sum(len(t.split()) for t in LIVE_AFTER_B2) / 4
    assert abs(idx.avg_len - want_avg) < 1e-9
    assert search_keyword(idx, "new").count() == 0
    assert search_keyword(idx, "final").count() == 1
    # second compaction: exact equivalence again (term_stats folded the
    # post-compaction delta, then compacted the new tombstones)
    reencode_blocks(spark, upserted_dir)
    idx = load_streaming_index(spark, upserted_dir)
    fresh = _fresh(spark, LIVE_AFTER_B2)
    assert idx.n_docs == 4
    a = sorted(map(tuple, idx.term_stats.collect()))
    b = sorted(map(tuple, fresh.term_stats.collect()))
    assert a == b
    want = _scores_by_text(fresh, LIVE_AFTER_B2, ["engine"])
    got = _by_text(
        spark, upserted_dir, search_bm25(idx, ["engine"], 10), [B0, B1, B2]
    )
    assert got == want


def test_upsert_off_appends_duplicates(spark, tmp_path):
    d = str(tmp_path / "sidx_noup")
    for i, rows in enumerate([B0, B1]):
        ingest_batch(
            _df(spark, rows), d, i,
            stem=False, positional=True, docs_per_segment=2,
            upsert=False,
        )
    idx = load_streaming_index(spark, d)
    assert idx.tombstones is None
    assert idx.n_docs == 6  # both cc versions retained
    assert search_keyword(idx, "old").count() == 1


def test_streaming_upsert_matches_batch_upsert(spark, tmp_path):
    """End-to-end through readStream/foreachBatch: the streamed re-send
    changes BM25 exactly as maintenance.upsert_documents does on a
    batch-built index of the initial corpus."""
    from peterman_search_engine_spark.operators.maintenance import (
        upsert_documents,
    )
    from peterman_search_engine_spark.sources.transcripts import SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    src = str(tmp_path / "in")
    os.makedirs(src)
    full = [r + ("user", "", ts) for r in [(c, i, t) for c, i, t in B0]]
    upd = [r + ("user", "", ts) for r in [(c, i, t) for c, i, t in B1]]
    cols = ["conv_id", "turn_idx", "text", "role", "tool", "ts"]
    for i, rows in enumerate([full, upd]):
        spark.createDataFrame(rows, cols).select(
            [
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in SCHEMA.fields
            ]
        ).coalesce(1).write.parquet(str(tmp_path / f"stage{i}"))
        import glob
        import shutil

        shutil.copy(
            glob.glob(str(tmp_path / f"stage{i}" / "*.parquet"))[0],
            os.path.join(src, f"{i:02d}.parquet"),
        )
    d = str(tmp_path / "sidx_e2e")
    q = start_incremental_build(
        spark, src, d, stem=False, positional=True,
        docs_per_segment=2, max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    reencode_blocks(spark, d)
    sidx = load_streaming_index(spark, d)

    # batch twin: initial corpus indexed with doc_ids 0..2 (the same
    # (conv, turn) order), then cc's doc replaced + new docs appended
    initial = _fresh(spark, [t for _, _, t in B0])
    updated = spark.createDataFrame(
        [(2, B1[0][2]), (3, B1[1][2]), (4, B1[2][2])],
        "doc_id long, text string",
    )
    bidx = upsert_documents(initial, updated, docs_per_segment=2)
    texts = {i: t for i, (_, _, t) in enumerate(B0)} | {
        2: B1[0][2], 3: B1[1][2], 4: B1[2][2]
    }
    for terms in (["engine"], ["payload"], ["fresh"]):
        want = _scores_by_text(bidx, texts, terms)
        got = _by_text(spark, d, search_bm25(sidx, terms, 10), [B0, B1])
        assert got == want, terms
