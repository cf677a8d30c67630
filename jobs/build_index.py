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

    corpus = corpus.localCheckpoint(eager=True)  # exclude input prep from build wall
    n_docs = corpus.count()
    t0 = time.perf_counter()
    if args.one_shot:
        from peterman_search_engine_spark.operators.indexer import build_index

        from pyspark.sql import functions as F

        idx = build_index(
            corpus,
            stem=not args.no_stem,
            positional=not args.no_positional,
            docs_per_segment=args.docs_per_segment,
        )
        idx.postings.write.mode("overwrite").parquet(
            os.path.join(args.output, "postings")
        )
        # derive term_stats from the WRITTEN postings (metadata-sized
        # agg over (segment, term) rows) instead of re-running the
        # whole posting pipeline for a second action
        spark.read.parquet(os.path.join(args.output, "postings")).groupBy(
            "term"
        ).agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.output, "term_stats"))
        idx.doc_stats.write.mode("overwrite").parquet(
            os.path.join(args.output, "doc_stats")
        )
        wall = time.perf_counter() - t0
        out = {"mode": "one-shot"}
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
