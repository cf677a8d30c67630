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
