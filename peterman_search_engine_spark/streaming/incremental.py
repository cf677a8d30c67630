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

* doc_ids stay globally dense: each batch is numbered from the running
  total in stable (conv_id, turn_idx) order — the streaming equivalent
  of the reference's insertion-order docID counter (``IIM:194-197``).
  Numbering uses the scalable two-level scheme
  (``sources.adapters.assign_dense_doc_ids``: range partition +
  per-partition counts + driver prefix sum), never a global
  single-partition window.
* exactly-once ingest with ONE commit point: every per-batch artifact
  (postings group, doc_stats partition, term_stats delta) is an
  idempotent overwrite, and the batch manifest row — which carries the
  batch's doc count and token length — is written LAST. All dynamic
  corpus stats (n_docs, total_len, avg_len, max_doc_id) are derived by
  folding committed manifests, so a crash anywhere before the manifest
  rename replays the batch byte-identically, and a crash after it
  skips the batch entirely. Nothing dynamic is persisted outside the
  manifest, so there is no ordering window in which stats and data can
  disagree.
* per-batch work is O(batch), never O(index): global term_stats are
  NOT rebuilt per batch — each batch writes its own (term, df, cf)
  delta partition and ``load_streaming_index`` folds the deltas (a
  term-level aggregation, metadata-sized) at load time;
  ``reencode_blocks`` compaction materializes them once.
* BM25/TF-IDF/boolean/phrase queries over the loaded index are exact
  and identical to a batch rebuild of the same corpus. The ONE thing
  that drifts is the stored block upper bounds (encoded with the
  avg_len known at batch time) — run ``reencode_blocks`` (compaction)
  before trusting block-max WAND pruning on a streaming-built index;
  every non-WAND query is exact without it, and WAND's block ranges
  are duplicate-row-safe either way (``operators.wand``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.indexer import (
    DEFAULT_BLOCK_SIZE,
    postings_from_tokens,
    tokenize_corpus,
)


def _config_path(index_dir: str) -> str:
    return os.path.join(index_dir, "config.json")


def _load_config(
    index_dir: str, stem: bool, positional: bool, dps: int, block_size: int
) -> dict:
    p = _config_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {
        "stem": stem,
        "positional": positional,
        "docs_per_segment": dps,
        "block_size": block_size,
    }


def _save_config(index_dir: str, cfg: dict) -> None:
    # static values only — idempotent, safe to rewrite on replay
    tmp = _config_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cfg, f)
    os.replace(tmp, _config_path(index_dir))


def _batch_manifest(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, "_manifest", f"batch_{batch_id}.json")


def read_manifests(index_dir: str) -> list[dict]:
    mdir = os.path.join(index_dir, "_manifest")
    rows = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.startswith("batch_") and name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
    return rows


def fold_stats(index_dir: str) -> dict:
    """Dynamic corpus stats derived from COMMITTED batch manifests —
    the single source of truth (a manifest row implies durable data,
    so these can never disagree with the index contents)."""
    n_docs = total_len = 0
    max_doc_id = -1
    for m in read_manifests(index_dir):
        n_docs += m["n_docs"]
        total_len += m["total_len"]
        max_doc_id = max(max_doc_id, m["doc_id_hi"] - 1)
    return {
        "n_docs": n_docs,
        "total_len": total_len,
        "avg_len": total_len / n_docs if n_docs else 0.0,
        "max_doc_id": max_doc_id,
    }


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
    batch-wise incremental loads. Reads NOTHING from prior groups —
    per-batch cost is O(batch)."""
    if os.path.exists(_batch_manifest(index_dir, batch_id)):
        return  # replayed batch — already durable
    if batch_df.isEmpty():
        return
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    t0 = time.perf_counter()
    cfg = _load_config(index_dir, stem, positional, docs_per_segment, block_size)
    _save_config(index_dir, cfg)
    prior = fold_stats(index_dir)
    base, prior_len = prior["n_docs"], prior["total_len"]

    # dense doc_ids continuing from the running total, stable
    # (conv_id, turn_idx) order within the batch, via the two-level
    # scheme (range partition + partition-local row numbers + driver
    # prefix sum of partition counts) — no single-partition window,
    # so a huge micro-batch still parallelizes.
    from ..sources.adapters import assign_dense_doc_ids

    corpus = (
        assign_dense_doc_ids(batch_df, ["conv_id", "turn_idx"])
        .withColumn("doc_id", F.col("doc_id") + F.lit(base))
        .select("doc_id", "text")
    )
    toks = tokenize_corpus(corpus, stem=cfg["stem"]).localCheckpoint(eager=True)

    lens = toks.agg(
        F.count("*").alias("n"), F.sum(F.size("tokens")).alias("total")
    ).collect()[0]
    n_batch, len_batch = int(lens["n"]), int(lens["total"] or 0)
    new_n = base + n_batch
    avg_len = (prior_len + len_batch) / new_n if new_n else 0.0

    # raw_positions=False: same persisted contract as plans.checkpoint
    # — positions live on disk only as the per-(term,doc) delta+varint
    # blob, and the nested arrays are never built
    sp = postings_from_tokens(
        toks,
        avg_len=avg_len,
        positional=cfg["positional"],
        docs_per_segment=cfg["docs_per_segment"],
        block_size=cfg["block_size"],
        raw_positions=False,
    )
    gdir = os.path.join(index_dir, "postings", f"group=stream_{batch_id}")
    sp.write.mode("overwrite").parquet(gdir)
    toks.select("doc_id", F.size("tokens").alias("doc_len")).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "doc_stats", f"batch={batch_id}"))

    # per-batch term_stats DELTA (term-level rows for THIS group only;
    # folded at load/compaction — the global table is never rebuilt
    # per batch, which would be O(total index) work)
    spark = batch_df.sparkSession
    written = spark.read.parquet(gdir)
    written.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    ).write.mode("overwrite").parquet(
        os.path.join(index_dir, "term_stats_delta", f"batch={batch_id}")
    )

    agg = written.agg(
        F.count("*").alias("rows"),
        F.sum("df").alias("entries"),
        F.sum(F.length("blob")).alias("blob_bytes"),
    ).collect()[0]
    row = {
        "batch": batch_id,
        "doc_id_lo": base,
        "doc_id_hi": base + n_batch,
        "n_docs": n_batch,
        "total_len": len_batch,
        "posting_rows": int(agg["rows"]),
        "posting_entries": int(agg["entries"] or 0),
        "blob_bytes": int(agg["blob_bytes"] or 0),
        "wall_sec": round(time.perf_counter() - t0, 4),
    }
    tmp = _batch_manifest(index_dir, batch_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(row, f)
    # the ONE commit point: everything above is an idempotent
    # overwrite; dynamic stats exist only as folds of these rows
    os.replace(tmp, _batch_manifest(index_dir, batch_id))


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
    Corpus stats fold from committed manifests; term_stats folds the
    per-batch deltas unless a compaction materialized the table."""
    from ..operators.indexer import InvertedIndex

    with open(_config_path(index_dir)) as f:
        cfg = json.load(f)
    stats = fold_stats(index_dir)

    postings = spark.read.option(
        "basePath", os.path.join(index_dir, "postings")
    ).parquet(os.path.join(index_dir, "postings"))
    if "group" in postings.columns:
        postings = postings.drop("group")
    positions_decoded = False
    if cfg["positional"] and "positions" not in postings.columns:
        from ..operators.indexer import with_positions

        postings = with_positions(postings)
        positions_decoded = True

    ts_dir = os.path.join(index_dir, "term_stats")
    if os.path.isdir(ts_dir):
        term_stats = spark.read.parquet(ts_dir)
    else:
        deltas = spark.read.option(
            "basePath", os.path.join(index_dir, "term_stats_delta")
        ).parquet(os.path.join(index_dir, "term_stats_delta"))
        term_stats = deltas.groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        )

    ds = spark.read.option(
        "basePath", os.path.join(index_dir, "doc_stats")
    ).parquet(os.path.join(index_dir, "doc_stats"))
    if "batch" in ds.columns:
        ds = ds.drop("batch")

    bm_dir = os.path.join(index_dir, "block_meta")
    return InvertedIndex(
        postings=postings,
        term_stats=term_stats,
        doc_stats=ds,
        n_docs=stats["n_docs"],
        avg_len=stats["avg_len"],
        positional=cfg["positional"],
        stem=cfg["stem"],
        block_size=cfg.get("block_size", DEFAULT_BLOCK_SIZE),
        block_meta=spark.read.parquet(bm_dir) if os.path.isdir(bm_dir) else None,
        positions_decoded=positions_decoded,
    )


def reencode_blocks(
    spark: SparkSession,
    index_dir: str,
    *,
    block_size: int | None = None,
) -> None:
    """Compaction, as ONE Spark job over the whole index (no per-group
    driver loop): merge duplicate (segment, term) posting rows left by
    micro-batch boundaries (concatenating doc_ids/tfs/positions in
    doc order — batches hold disjoint doc ranges, so this is the
    merge_segments factor=1 aggregation) and recompute every blob and
    block upper bound with the FINAL avg_len, making block-max WAND
    bounds fresh. Also materializes term_stats and the narrow
    block_meta table. Commits by directory swap (postings →
    postings_old → removed); a crash mid-swap leaves postings_old as
    the recovery copy."""
    from ..operators.indexer import merge_segments
    from ..operators.wand import block_meta_df

    idx = load_streaming_index(spark, index_dir)
    if block_size is None:
        block_size = idx.block_size
    # factor=1 keeps segment ids; the groupBy(segment, term) merges the
    # per-batch duplicate rows and the encode UDF re-derives blob +
    # blocks from the merged lists with the final avg_len
    merged = merge_segments(idx, factor=1, block_size=block_size)

    pdir = os.path.join(index_dir, "postings")
    new_dir = pdir + ".new"
    old_dir = pdir + ".old"
    out = merged.postings
    if merged.positional:
        out = out.drop("positions")  # persisted contract: compressed only
    out.write.mode("overwrite").parquet(new_dir)

    merged.term_stats.write.mode("overwrite").parquet(
        os.path.join(index_dir, "term_stats")
    )
    if os.path.isdir(old_dir):
        import shutil

        shutil.rmtree(old_dir)
    os.rename(pdir, old_dir)
    os.rename(new_dir, pdir)
    import shutil

    shutil.rmtree(old_dir)

    final = load_streaming_index(spark, index_dir)
    final.block_meta = None  # derive fresh from the rewritten postings
    block_meta_df(final).write.mode("overwrite").parquet(
        os.path.join(index_dir, "block_meta")
    )
