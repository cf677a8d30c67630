"""Streaming incremental index == batch rebuild of the same corpus."""

import os

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators.indexer import build_index
from peterman_search_engine_spark.operators.query import (
    search_and,
    search_bm25,
    search_phrase,
)
from peterman_search_engine_spark.operators.wand import bm25_topk_wand
from peterman_search_engine_spark.sources.transcripts import generate_transcripts
from peterman_search_engine_spark.streaming.incremental import (
    ingest_batch,
    load_streaming_index,
    reencode_blocks,
    start_incremental_build,
)


@pytest.fixture(scope="module")
def split_input(spark, tmp_path_factory):
    """The small transcript tier split into two parquet files (two
    conv_id ranges) so maxFilesPerTrigger=1 yields two micro-batches
    in conv order."""
    d = str(tmp_path_factory.mktemp("stream_in"))
    df = generate_transcripts(spark, "small")
    a = df.filter(F.col("conv_id") < "conv000125").coalesce(1)
    b = df.filter(F.col("conv_id") >= "conv000125").coalesce(1)
    a.write.parquet(os.path.join(d, "part_a"))
    b.write.parquet(os.path.join(d, "part_b"))
    # file source: one file per dir write; flatten to the expected names
    import glob
    import shutil

    for i, sub in enumerate(["part_a", "part_b"]):
        src = glob.glob(os.path.join(d, sub, "*.parquet"))[0]
        shutil.copy(src, os.path.join(d, f"{i:02d}.parquet"))
        shutil.rmtree(os.path.join(d, sub))
    return d


def _expected_corpus(spark, split_input):
    """doc_ids as streaming assigns them: file 0's rows (sorted by
    conv_id, turn_idx) first, then file 1's."""
    dfs = []
    base = 0
    for i in range(2):
        df = spark.read.parquet(os.path.join(split_input, f"{i:02d}.parquet"))
        rows = sorted(
            df.select("conv_id", "turn_idx", "text").collect(),
            key=lambda r: (r["conv_id"], r["turn_idx"]),
        )
        dfs.append([(base + j, r["text"]) for j, r in enumerate(rows)])
        base += len(rows)
    flat = [x for part in dfs for x in part]
    return spark.createDataFrame(flat, "doc_id long, text string")


def test_streaming_matches_batch(spark, split_input, tmp_path):
    index_dir = str(tmp_path / "sidx")
    q = start_incremental_build(
        spark, split_input, index_dir,
        stem=False, positional=True, docs_per_segment=200,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert os.path.exists(os.path.join(index_dir, "_manifest", "batch_0.json"))
    assert os.path.exists(os.path.join(index_dir, "_manifest", "batch_1.json"))

    sidx = load_streaming_index(spark, index_dir)
    bidx = build_index(
        _expected_corpus(spark, split_input),
        stem=False, positional=True, docs_per_segment=200,
    )
    assert sidx.n_docs == bidx.n_docs
    assert abs(sidx.avg_len - bidx.avg_len) < 1e-9

    for terms in (["spark", "merge"], ["index"]):
        a = [(r["doc_id"], round(r["score"], 9))
             for r in search_bm25(sidx, terms, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in search_bm25(bidx, terms, 10).collect()]
        assert a == b
    a = sorted(r["doc_id"] for r in search_and(sidx, ["spark", "merge"]).collect())
    b = sorted(r["doc_id"] for r in search_and(bidx, ["spark", "merge"]).collect())
    assert a == b
    a = sorted(r["doc_id"] for r in search_phrase(sidx, ["fast", "table"]).collect())
    b = sorted(r["doc_id"] for r in search_phrase(bidx, ["fast", "table"]).collect())
    assert a == b


def test_streaming_replay_idempotent(spark, split_input, tmp_path):
    index_dir = str(tmp_path / "sidx2")
    df0 = spark.read.parquet(os.path.join(split_input, "00.parquet"))
    ingest_batch(df0, index_dir, 0, stem=False, positional=False,
                 docs_per_segment=200)
    sidx = load_streaming_index(spark, index_dir)
    n1 = sidx.n_docs
    rows1 = sidx.postings.count()
    # replay the same batch id (crash-recovery path): must be a no-op
    ingest_batch(df0, index_dir, 0, stem=False, positional=False,
                 docs_per_segment=200)
    sidx2 = load_streaming_index(spark, index_dir)
    assert sidx2.n_docs == n1
    assert sidx2.postings.count() == rows1


def test_reencode_enables_wand(spark, split_input, tmp_path):
    index_dir = str(tmp_path / "sidx3")
    for i in range(2):
        ingest_batch(
            spark.read.parquet(os.path.join(split_input, f"{i:02d}.parquet")),
            index_dir, i, stem=False, positional=False,
            docs_per_segment=200,
        )
    reencode_blocks(spark, index_dir)
    sidx = load_streaming_index(spark, index_dir)
    bidx = build_index(
        _expected_corpus(spark, split_input),
        stem=False, positional=False, docs_per_segment=200,
    )
    a = [(r["doc_id"], round(r["score"], 9))
         for r in bm25_topk_wand(sidx, ["spark", "merge"], 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in search_bm25(bidx, ["spark", "merge"], 10).collect()]
    assert a == b


def test_streaming_wand_unaligned_batches(spark, tmp_path):
    """Batch sizes deliberately NOT multiples of docs_per_segment: the
    micro-batch boundary falls inside a segment, producing duplicate
    (segment, term) posting rows. After reencode_blocks the duplicates
    must be merged away and forced-prune WAND must be rank-identical
    to a batch rebuild (the high-severity round-1 regression)."""
    from pyspark.sql import functions as F

    index_dir = str(tmp_path / "sidx_unaligned")
    n = 500
    docs = spark.range(n).select(
        F.format_string("c%05d", F.col("id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.concat(
            F.lit("alpha beta common "),
            F.when(F.col("id") % 7 == 0, F.lit("rare spark merge ")).otherwise(F.lit("")),
            F.lit("tail word"),
        ).alias("text"),
        F.col("id").alias("_id"),
    )
    # three batches of 137 / 211 / 152 docs (none a multiple of 100)
    cuts = [(0, 137), (137, 348), (348, 500)]
    for i, (lo, hi) in enumerate(cuts):
        ingest_batch(
            docs.filter((F.col("_id") >= lo) & (F.col("_id") < hi)).drop("_id"),
            index_dir, i, stem=False, positional=False, docs_per_segment=100,
        )
    pre = load_streaming_index(spark, index_dir)
    assert (
        pre.postings.groupBy("segment", "term").count()
        .filter(F.col("count") > 1).count() > 0
    ), "fixture must actually produce duplicate (segment, term) rows"
    reencode_blocks(spark, index_dir)
    sidx = load_streaming_index(spark, index_dir)
    assert (
        sidx.postings.groupBy("segment", "term").count()
        .filter(F.col("count") > 1).count() == 0
    ), "reencode_blocks must merge duplicate rows"
    bidx = build_index(
        docs.select(F.col("_id").alias("doc_id"), "text"),
        stem=False, positional=False, docs_per_segment=100,
    )
    for terms in (["rare", "common"], ["spark", "merge"], ["alpha"]):
        a = [(r["doc_id"], round(r["score"], 9))
             for r in bm25_topk_wand(sidx, terms, 10, force_prune=True).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in search_bm25(bidx, terms, 10).collect()]
        assert a == b, terms


def test_streaming_crash_before_manifest_replays_exactly(spark, split_input, tmp_path):
    """The manifest is the single commit point: simulate a crash AFTER
    the batch's data writes but BEFORE the manifest rename by deleting
    the manifest, then replay the batch. Stats fold from manifests
    only, so the replay re-ingests with the same base and the index
    equals a batch rebuild (no doc_id shift, no double counting)."""
    index_dir = str(tmp_path / "sidx_crash")
    for i in range(2):
        ingest_batch(
            spark.read.parquet(os.path.join(split_input, f"{i:02d}.parquet")),
            index_dir, i, stem=False, positional=True, docs_per_segment=200,
        )
    # crash window: batch 1's data is on disk but its manifest is not
    os.remove(os.path.join(index_dir, "_manifest", "batch_1.json"))
    sidx_partial = load_streaming_index(spark, index_dir)
    assert sidx_partial.n_docs == spark.read.parquet(
        os.path.join(split_input, "00.parquet")
    ).count()  # uncommitted batch invisible to stats
    # replay
    ingest_batch(
        spark.read.parquet(os.path.join(split_input, "01.parquet")),
        index_dir, 1, stem=False, positional=True, docs_per_segment=200,
    )
    sidx = load_streaming_index(spark, index_dir)
    bidx = build_index(
        _expected_corpus(spark, split_input),
        stem=False, positional=True, docs_per_segment=200,
    )
    assert sidx.n_docs == bidx.n_docs
    assert abs(sidx.avg_len - bidx.avg_len) < 1e-9
    a = [(r["doc_id"], round(r["score"], 9))
         for r in search_bm25(sidx, ["spark", "merge"], 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in search_bm25(bidx, ["spark", "merge"], 10).collect()]
    assert a == b


def test_streaming_ingest_never_rescans_prior_groups(spark, split_input, tmp_path):
    """Per-batch ingest cost must be O(batch), not O(index): corrupt
    batch 0's posting group and term_stats delta on disk — if batch 1's
    ingest read ANY prior group (the round-1 behavior rebuilt global
    term_stats from every group each batch), it would fail on the
    garbage parquet. Success proves no rescan."""
    index_dir = str(tmp_path / "sidx_noscan")
    ingest_batch(
        spark.read.parquet(os.path.join(split_input, "00.parquet")),
        index_dir, 0, stem=False, positional=False, docs_per_segment=200,
    )
    for sub in ("postings/group=stream_0", "term_stats_delta/batch=0"):
        d = os.path.join(index_dir, sub)
        for name in os.listdir(d):
            if name.endswith(".parquet"):
                with open(os.path.join(d, name), "wb") as f:
                    f.write(b"NOT A PARQUET FILE")
    # must succeed without touching the corrupted group
    ingest_batch(
        spark.read.parquet(os.path.join(split_input, "01.parquet")),
        index_dir, 1, stem=False, positional=False, docs_per_segment=200,
    )
    assert os.path.exists(os.path.join(index_dir, "_manifest", "batch_1.json"))
