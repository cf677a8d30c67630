"""Incremental index maintenance via Structured Streaming.

The reference is batch-only (SURVEY.md §2.5) — its closest analogue is
the LSM ``addDocument``/auto-``flush`` path
(``InvertedIndexManager.java:169-263``): new docs accumulate and
become immutable segments. This module is the Spark-native version of
that write path: a ``readStream`` over arriving transcript files,
``foreachBatch`` turning each micro-batch into posting groups appended
to the same on-disk index layout that ``plans.checkpoint`` builds, so
the batch query operators work unchanged over a streaming-built index.

Semantics:

* doc_ids stay globally dense: each batch is sorted by the stable
  (conv_id, turn_idx) key and numbered from the running total in
  ``stats.json`` — the streaming equivalent of the reference's
  insertion-order docID counter (``IIM:194-197``).
* idempotent ingest: Structured Streaming replays a batch after a
  crash; the per-batch manifest row (written AFTER the parquet commit,
  same write-ahead ordering as ``plans.checkpoint``) makes the replay
  a no-op, so the index gets exactly-once contents.
* BM25 global stats (n_docs, total_len → avg_len) are folded forward
  in ``stats.json``; exact BM25/TF-IDF/boolean/phrase queries over the
  loaded index are therefore identical to a batch rebuild of the same
  corpus. The ONE thing that drifts is the stored block upper bounds
  (encoded with the avg_len known at batch time) — run
  ``reencode_blocks`` (compaction) before trusting block-max WAND
  pruning on a streaming-built index; every non-WAND query is exact
  without it.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.indexer import (
    DEFAULT_BLOCK_SIZE,
    postings_from_tokens,
    tokenize_corpus,
)


def _stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def _load_stats(index_dir: str, stem: bool, positional: bool, dps: int) -> dict:
    p = _stats_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {
        "n_docs": 0,
        "total_len": 0,
        "avg_len": 0.0,
        "max_doc_id": -1,
        "stem": stem,
        "positional": positional,
        "docs_per_segment": dps,
        "segments_per_group": 1,
    }


def _save_stats(index_dir: str, stats: dict) -> None:
    tmp = _stats_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, _stats_path(index_dir))


def _batch_manifest(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, "_manifest", f"batch_{batch_id}.json")


def ingest_batch(
    batch_df: DataFrame,
    index_dir: str,
    batch_id: int,
    *,
    stem: bool = True,
    positional: bool = True,
    docs_per_segment: int = 100_000,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> None:
    """foreachBatch body: one micro-batch of transcript rows → one
    posting group appended to the index. Also usable directly for
    batch-wise incremental loads."""
    if os.path.exists(_batch_manifest(index_dir, batch_id)):
        return  # replayed batch — already durable
    if batch_df.isEmpty():
        return
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    t0 = time.perf_counter()
    stats = _load_stats(index_dir, stem, positional, docs_per_segment)
    base = stats["n_docs"]

    # dense doc_ids continuing from the running total, stable
    # (conv_id, turn_idx) order within the batch. A micro-batch is
    # bounded (maxFilesPerTrigger), so a single window here is fine;
    # the scalable two-level scheme (sources.adapters) applies if
    # batches are huge.
    w = Window.orderBy("conv_id", "turn_idx")
    corpus = (
        batch_df.withColumn("doc_id", F.row_number().over(w) - 1 + F.lit(base))
        .select("doc_id", "text")
    )
    toks = tokenize_corpus(corpus, stem=stem).localCheckpoint(eager=True)

    lens = toks.agg(
        F.count("*").alias("n"), F.sum(F.size("tokens")).alias("total")
    ).collect()[0]
    n_batch, len_batch = int(lens["n"]), int(lens["total"] or 0)
    new_total_len = stats["total_len"] + len_batch
    new_n = stats["n_docs"] + n_batch
    avg_len = new_total_len / new_n if new_n else 0.0

    sp = postings_from_tokens(
        toks,
        avg_len=avg_len,
        positional=positional,
        docs_per_segment=docs_per_segment,
        block_size=block_size,
    )
    gdir = os.path.join(index_dir, "postings", f"group=stream_{batch_id}")
    sp.write.mode("overwrite").parquet(gdir)
    toks.select("doc_id", F.size("tokens").alias("doc_len")).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "doc_stats", f"batch={batch_id}"))

    spark = batch_df.sparkSession
    allp = spark.read.option(
        "basePath", os.path.join(index_dir, "postings")
    ).parquet(os.path.join(index_dir, "postings"))
    allp.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "term_stats"))

    stats.update(
        {
            "n_docs": new_n,
            "total_len": new_total_len,
            "avg_len": avg_len,
            "max_doc_id": base + n_batch - 1,
        }
    )
    _save_stats(index_dir, stats)

    agg = spark.read.parquet(gdir).agg(
        F.count("*").alias("rows"),
        F.sum("df").alias("entries"),
        F.sum(F.length("blob")).alias("blob_bytes"),
    ).collect()[0]
    row = {
        "batch": batch_id,
        "doc_id_lo": base,
        "doc_id_hi": base + n_batch,
        "posting_rows": int(agg["rows"]),
        "posting_entries": int(agg["entries"] or 0),
        "blob_bytes": int(agg["blob_bytes"] or 0),
        "wall_sec": round(time.perf_counter() - t0, 4),
    }
    tmp = _batch_manifest(index_dir, batch_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.replace(tmp, _batch_manifest(index_dir, batch_id))  # commit point


def start_incremental_build(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    *,
    stem: bool = True,
    positional: bool = True,
    docs_per_segment: int = 100_000,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """readStream(transcript parquet dir) → foreachBatch(ingest_batch).
    Returns the StreamingQuery; with ``available_now`` it drains the
    currently-available files and stops (use ``awaitTermination``)."""
    from ..sources.transcripts import SCHEMA

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df,
            index_dir,
            batch_id,
            stem=stem,
            positional=positional,
            docs_per_segment=docs_per_segment,
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", os.path.join(index_dir, "_stream_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_streaming_index(spark: SparkSession, index_dir: str):
    """Open a streaming-built index with the batch query surface.
    doc_stats is partitioned by batch; drop the partition column."""
    from ..plans.checkpoint import load_index  # layout-compatible
    from ..operators.indexer import InvertedIndex

    idx = load_index(spark, index_dir)
    ds = spark.read.option(
        "basePath", os.path.join(index_dir, "doc_stats")
    ).parquet(os.path.join(index_dir, "doc_stats"))
    if "batch" in ds.columns:
        ds = ds.drop("batch")
    return InvertedIndex(
        postings=idx.postings,
        term_stats=idx.term_stats,
        doc_stats=ds,
        n_docs=idx.n_docs,
        avg_len=idx.avg_len,
        positional=idx.positional,
        stem=idx.stem,
    )


def reencode_blocks(
    spark: SparkSession,
    index_dir: str,
    *,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> None:
    """Compaction: recompute every group's block upper bounds with the
    FINAL avg_len so block-max WAND is valid over a streaming-built
    index. Rewrites each posting group in place (blob bytes are
    avg_len-independent and unchanged)."""
    from ..operators.indexer import _make_encode_udf

    with open(_stats_path(index_dir)) as f:
        stats = json.load(f)
    ds = spark.read.option(
        "basePath", os.path.join(index_dir, "doc_stats")
    ).parquet(os.path.join(index_dir, "doc_stats"))
    if "batch" in ds.columns:
        ds = ds.drop("batch")
    pdir = os.path.join(index_dir, "postings")
    enc_udf = _make_encode_udf(stats["avg_len"], block_size)
    for group in os.listdir(pdir):
        if not group.startswith("group="):
            continue
        gdir = os.path.join(pdir, group)
        sp = spark.read.parquet(gdir)
        exploded = sp.select(
            "segment", "term", F.explode("doc_ids").alias("_d")
        ).join(ds, F.col("_d") == ds.doc_id).groupBy("segment", "term").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_d").alias("doc_id"), "doc_len"))
            ).alias("_dl")
        ).select("segment", "term", F.col("_dl.doc_len").alias("_doc_lens"))
        enc = enc_udf(F.col("doc_ids"), F.col("tfs"), F.col("_doc_lens"))
        out = (
            sp.join(exploded, ["segment", "term"])
            .withColumn("_enc", enc)
            .withColumn("blob", F.col("_enc.blob"))
            .withColumn("block_starts", F.col("_enc.block_starts"))
            .withColumn("block_ubs", F.col("_enc.block_ubs"))
            .drop("_enc", "_doc_lens")
        )
        tmp = gdir + ".tmp"
        out.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(gdir)
        os.rename(tmp, gdir)
