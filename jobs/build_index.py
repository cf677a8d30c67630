"""spark-submit entrypoint: checkpointed index build.

North-rule deployment shape::

    zip -r pse.zip peterman_search_engine_spark
    spark-submit --py-files pse.zip jobs/build_index.py \
        --input synthetic:medium --output /tmp/pse_index \
        --docs-per-segment 100000

``--input`` is either a parquet path of transcripts
(conv_id, turn_idx, role, text, tool, ts) / documents (doc_id, text),
or ``synthetic:<tier>`` for the deterministic generator. Re-running
after an interruption resumes: completed checkpoint groups are skipped
(their manifest rows exist). Prints a JSON build report including the
per-group lineage metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--docs-per-segment", type=int, default=100_000)
    ap.add_argument("--segments-per-group", type=int, default=8)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--no-positional", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--one-shot", action="store_true",
        help="single-job build (no checkpoint groups) — used for "
        "throughput/scaling measurement where the driver-side group "
        "loop would serialize jobs",
    )
    args = ap.parse_args()

    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.plans.checkpoint import (
        build_index_checkpointed,
        metrics_df,
    )
    from peterman_search_engine_spark.sources.adapters import (
        corpus_from_documents,
        corpus_from_transcripts,
    )

    spark = get_spark("pse-build-index", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    if args.input.startswith("synthetic:"):
        from peterman_search_engine_spark.sources.transcripts import (
            generate_transcripts,
        )

        df = generate_transcripts(spark, args.input.split(":", 1)[1])
        corpus = corpus_from_transcripts(df)
    else:
        df = spark.read.parquet(args.input)
        if "doc_id" in df.columns:
            corpus = corpus_from_documents(df)
        else:
            corpus = corpus_from_transcripts(df)

    # Input prep (excluded from the build wall): restore the docmap
    # partitioning invariant — dense doc_ids are assigned on the output
    # of a repartitionByRange(conv_id, turn_idx), so a corpus fresh out
    # of ``assign_dense_doc_ids`` is ALREADY range-partitioned in
    # doc_id order. The driver testdata / synthetic corpus carries
    # pre-assigned doc_ids, so the range partitioning is re-established
    # here once; partition = segment (a disjoint doc_id range), which
    # makes the posting build itself shuffle-free.
    n_docs = corpus.count()
    nparts = max(
        spark.sparkContext.defaultParallelism * 2,
        n_docs // args.docs_per_segment + 1,
    )
    corpus = corpus.repartitionByRange(nparts, "doc_id").localCheckpoint(
        eager=True
    )
    t0 = time.perf_counter()
    if args.one_shot:
        from peterman_search_engine_spark.operators.indexer import (
            postings_from_aligned_corpus,
        )
        from peterman_search_engine_spark.functions.analysis import tokens_expr

        from pyspark.sql import functions as F

        # 1. doc_stats: the ONLY pass that tokenizes on the JVM — write
        # it, then reuse the written parquet for the avg_len aggregate
        # so the tokenize expression never runs twice
        phases = {}
        doc_stats = corpus.select(
            "doc_id", F.size(tokens_expr("text")).alias("doc_len")
        )
        doc_stats.write.mode("overwrite").parquet(
            os.path.join(args.output, "doc_stats")
        )
        phases["doc_stats"] = round(time.perf_counter() - t0, 2)
        ds = spark.read.parquet(os.path.join(args.output, "doc_stats"))
        row = ds.agg(F.avg("doc_len").alias("avg")).collect()[0]
        avg_len = float(row["avg"] or 0.0)
        tp = time.perf_counter()
        # 2. postings: ZERO-SHUFFLE fused build — segment = input
        # partition (doc_id range from the prep repartitionByRange).
        # raw_positions=False: the persisted contract stores positions
        # compressed-only, so the nested array column is never built
        postings_from_aligned_corpus(
            corpus,
            avg_len=avg_len,
            stem=not args.no_stem,
            positional=not args.no_positional,
            raw_positions=False,
        ).write.mode("overwrite").parquet(os.path.join(args.output, "postings"))
        phases["postings"] = round(time.perf_counter() - tp, 2)
        tp = time.perf_counter()
        # 3. term_stats from the WRITTEN postings (metadata-sized agg
        # over (segment, term) rows — never re-runs the pipeline)
        spark.read.parquet(os.path.join(args.output, "postings")).groupBy(
            "term"
        ).agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output, "term_stats"))
        phases["term_stats"] = round(time.perf_counter() - tp, 2)
        # 4. per-partition lineage metrics from the DURABLE output
        # (north-rule auditability): one row per segment with record
        # counts and byte sizes, queryable as a table
        spark.read.parquet(os.path.join(args.output, "postings")).groupBy(
            "segment"
        ).agg(
            F.count("*").alias("posting_rows"),
            F.sum("df").alias("posting_entries"),
            F.sum(F.length("blob")).alias("blob_bytes"),
            F.min(F.element_at("doc_ids", 1)).alias("doc_id_lo"),
            F.max(F.element_at("doc_ids", -1)).alias("doc_id_hi"),
        ).write.mode("overwrite").parquet(os.path.join(args.output, "_metrics"))
        wall = time.perf_counter() - t0
        out = {"mode": "one-shot", "phases": phases}
    else:
        report = build_index_checkpointed(
            corpus,
            args.output,
            stem=not args.no_stem,
            positional=not args.no_positional,
            docs_per_segment=args.docs_per_segment,
            segments_per_group=args.segments_per_group,
        )
        wall = time.perf_counter() - t0
        out = {
            "mode": "checkpointed",
            "groups_total": report["groups_total"],
            "groups_built": report["groups_built"],
            "groups_skipped": report["groups_skipped"],
            "lineage": [r.asDict() for r in metrics_df(spark, args.output).collect()],
        }
    out.update(
        {
            "n_docs": n_docs,
            "build_wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 2),
        }
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
