"""Cold-start query latency against the PERSISTED index layout.

The warm bench queries (`bench.py` topk leg) serve an in-session
`localCheckpoint` index (`__spark_entry__._index`) — at 100 TB no
query is served from driver-warm blocks; every query re-opens the
persisted tables, exactly as every reference query re-opens its
segment files (reference `SegmentInDiskManager.java:259-341`). This
script measures that path honestly with two separate OS processes:

  --build    build + persist the index at --work-dir from
             ``documents.parquet`` at --sf-dir via
             ``plans.checkpoint.build_index_checkpointed`` (same
             stem/positional/segmenting as the warm bench index).
             Skipped when ``--keep`` and the manifest already exists.
  --measure  a FRESH process/SparkSession that never saw the build:
             ``plans.checkpoint.load_index`` + the SAME six ranked/
             boolean queries the warm leg times, served purely from
             the persisted parquet tables — no localCheckpoint, no
             cache. Prints ONE JSON line: per-query first-run (true
             cold: parquet footers + codegen + JVM warmup) and
             interleaved medians, ``p95_query_sec_cold`` (same
             statistic as the warm ``p95_query_sec``: max of the six
             per-query medians), and a pushdown assertion that the
             cold bm25 plan still reaches the scan with a term filter
             (``PushedFilters``) — the property that makes the cold
             path O(query terms), not O(index).

bench.py orchestrates both phases as subprocesses and records the
result under ``p95_query_sec_cold`` / ``cold_query`` in the detail
record (BENCH/BASELINE.md "p95 definition").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# the warm bench's query mix, verbatim (apples-to-apples)
AND_TERMS = ["spark", "merge", "window"]
OR_TERMS = ["vector", "stream"]
PHRASE = ["fast", "table"]
BM25_TERMS = ["spark", "merge"]
TFIDF_TERMS = ["query", "data", "data"]
TOP_K = 10


def _session(app: str, cpus: str):
    from peterman_search_engine_spark.plans.session import get_spark

    spark = get_spark(app, master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def do_build(sf_dir: str, work_dir: str, cpus: str, keep: bool) -> None:
    if keep and os.path.exists(os.path.join(work_dir, "stats.json")):
        print(json.dumps({"built": False, "kept": work_dir}))
        return
    from peterman_search_engine_spark.plans.checkpoint import (
        build_index_checkpointed,
    )
    from peterman_search_engine_spark.sources.adapters import (
        corpus_from_documents,
    )

    spark = _session("pse-cold-build", cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # same segmenting rule as __spark_entry__._index: ~64 doc_id-range
    # segments, floored so tiny fixtures stay multi-segment
    dps = max(200, -(-n // 64))
    t0 = time.perf_counter()
    report = build_index_checkpointed(
        corpus_from_documents(docs), work_dir,
        stem=False, positional=True, docs_per_segment=dps,
    )
    print(json.dumps({
        "built": True,
        "build_sec": round(time.perf_counter() - t0, 4),
        "groups_total": report["groups_total"],
        "n_docs": n,
    }))
    spark.stop()


def do_measure(work_dir: str, cpus: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from peterman_search_engine_spark.operators import query as Q
    from peterman_search_engine_spark.operators.wand import bm25_topk_wand
    from peterman_search_engine_spark.plans.checkpoint import load_index

    spark = _session("pse-cold-query", cpus)
    t0 = time.perf_counter()
    idx = load_index(spark, work_dir)
    load_sec = round(time.perf_counter() - t0, 4)

    def _e6_top(scored):
        return (
            scored.withColumn(
                "score_e6", F.round(F.col("score") * 1e6).cast("long")
            )
            .select("doc_id", "score_e6")
            .orderBy(F.desc("score_e6"), F.asc("doc_id"))
            .limit(TOP_K)
        )

    queries = {
        "bm25_topk": lambda: _e6_top(Q.bm25_scores(idx, BM25_TERMS)),
        "bm25_wand_topk": lambda: _e6_top(
            bm25_topk_wand(idx, BM25_TERMS, TOP_K * 3)
        ),
        "tfidf_topk": lambda: _e6_top(Q.tfidf_scores(idx, TFIDF_TERMS)),
        "and_search": lambda: Q.search_and(idx, AND_TERMS),
        "or_search": lambda: Q.search_or(idx, OR_TERMS),
        "phrase_search": lambda: Q.search_phrase(idx, PHRASE),
    }

    # pushdown proof: the cold bm25 plan's posting scan must carry the
    # query-term filter down to parquet (PushedFilters non-empty) — the
    # property that keeps the cold path O(query terms) at 100 TB
    plan = (
        queries["bm25_topk"]()
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed_ok = "PushedFilters: [" in plan and "term" in plan.split(
        "PushedFilters: ["
    )[1][:200]

    first: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in queries}
    for rep in range(reps + 1):  # rep 0 = the true-cold first pass
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn().collect()
            dt = time.perf_counter() - t0
            if rep == 0:
                first[name] = round(dt, 4)
            else:
                samples[name].append(dt)
    medians = {
        n: round(sorted(v)[len(v) // 2], 4) for n, v in samples.items()
    }
    med_sorted = sorted(medians.values())
    p95 = round(
        med_sorted[min(len(med_sorted) - 1, int(0.95 * len(med_sorted)))], 4
    )
    print(json.dumps({
        "load_index_sec": load_sec,
        "first_run_sec": first,
        "topk_median_cold_sec": medians,
        "p95_query_sec_cold": p95,
        "pushed_filters_ok": bool(pushed_ok),
        "reps": reps,
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/pse_cold_index")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    if args.build:
        do_build(args.sf_dir, args.work_dir, args.cpus, args.keep)
    if args.measure:
        do_measure(args.work_dir, args.cpus, args.reps)
    if not (args.build or args.measure):
        ap.error("pass --build and/or --measure")


if __name__ == "__main__":
    main()
