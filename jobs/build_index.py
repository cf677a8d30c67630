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

    report = build_index_checkpointed(
        corpus,
        args.output,
        stem=not args.no_stem,
        positional=not args.no_positional,
        docs_per_segment=args.docs_per_segment,
        segments_per_group=args.segments_per_group,
    )
    lineage = [r.asDict() for r in metrics_df(spark, args.output).collect()]
    print(
        json.dumps(
            {
                "groups_total": report["groups_total"],
                "groups_built": report["groups_built"],
                "groups_skipped": report["groups_skipped"],
                "lineage": lineage,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
