"""Hot-term skew: measured evidence that the segment-salted posting
aggregation bounds the straggler a naive global groupBy(term) creates.

The north rule calls for "merge segment postings via salted
repartition-by-term to defuse hot-term skew". The shipped design
(indexer.postings_from_tokens / merge_segments) keys every posting
aggregation by (segment, term) — the doc-range segment id IS the
salt, so a term planted in 50% of all docs still lands in rows of at
most docs_per_segment entries, and no reducer task ever holds a whole
hot posting list. The naive design every first Spark port writes —
``groupBy(term).agg(sort_array(collect_list(...)))`` straight off the
token stream — concentrates each hot term's full posting list (~n/2
entries here) in ONE reducer task.

This script plants 8 hot terms in ~50% of ``--n-docs`` docs
(``sources.regime`` — the same corpus the WAND study uses), runs both
aggregations on the same tokenized input, and records for each:

* wall seconds (interleaved reps, median);
* per-task executorRunTime max / median / p95 for the reduce stage,
  from Spark's own metrics (the REST taskSummary endpoint) — the
  straggler ratio max/median is the skew headline;
* the data-side key weights (max single-key entries vs total), which
  explain the task numbers deterministically.

Writes BENCH/skew.json and prints one JSON line.

Usage::

    python scripts/skew_study.py [--n-docs 4000000] [--reps 2]
        [--cpus 32] [--docs-per-segment 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _stage_ids(base: str, app: str) -> set[int]:
    return {
        s["stageId"]
        for s in _rest(base, f"/api/v1/applications/{app}/stages")
    }


def _reduce_stage_summary(base: str, app: str, new_stages: set[int]) -> dict:
    """Task-duration distribution of the heaviest NEW stage (the
    reduce): max/median/p95 executorRunTime plus task count."""
    best = None
    for sid in new_stages:
        for st in _rest(base, f"/api/v1/applications/{app}/stages/{sid}"):
            if st.get("status") != "COMPLETE":
                continue
            run = st.get("executorRunTime", 0)
            if best is None or run > best[0]:
                best = (run, sid, st["attemptId"], st["numCompleteTasks"])
    if best is None:
        return {}
    _, sid, att, ntasks = best
    q = _rest(
        base,
        f"/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
        "?quantiles=0.5,0.95,1.0",
    )
    med, p95, mx = (round(v / 1000.0, 3) for v in q["executorRunTime"])
    return {
        "stage_id": sid,
        "num_tasks": ntasks,
        "task_sec_median": med,
        "task_sec_p95": p95,
        "task_sec_max": mx,
        "straggler_ratio": round(mx / med, 2) if med else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs-per-segment", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from peterman_search_engine_spark.operators.indexer import (
        postings_from_tokens,
        tokenize_corpus,
    )
    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.sources.regime import (
        generate_rare_common_corpus,
    )

    spark = get_spark(
        "skew-study", master=f"local[{args.cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    corpus = generate_rare_common_corpus(spark, args.n_docs)
    toks = tokenize_corpus(corpus, stem=False).localCheckpoint(eager=True)
    avg_len = float(
        toks.agg(F.avg(F.size("tokens"))).collect()[0][0]
    )

    def salted():
        # the shipped build path: (segment, term)-keyed aggregation —
        # segment = doc_id // docs_per_segment bounds every key
        sp = postings_from_tokens(
            toks, avg_len=avg_len, positional=False,
            docs_per_segment=args.docs_per_segment,
        )
        return sp.agg(
            F.count("*").alias("rows"), F.sum("df").alias("entries")
        ).collect()[0]

    def naive():
        # the strawman: one global row per term — each hot term's
        # ~n/2-entry posting list funnels through a single reducer
        ex = toks.select(
            "doc_id", F.explode("tokens").alias("term")
        ).groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
        p = ex.groupBy("term").agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("postings")
        )
        return p.agg(
            F.count("*").alias("rows"),
            F.sum(F.size("postings")).alias("entries"),
        ).collect()[0]

    legs = {"salted": salted, "naive": naive}
    walls: dict[str, list[float]] = {k: [] for k in legs}
    stages: dict[str, dict] = {}
    for rep in range(args.reps):
        for name, fn in legs.items():  # interleaved E,P,E,P protocol
            before = _stage_ids(base, app)
            t0 = time.perf_counter()
            row = fn()
            walls[name].append(round(time.perf_counter() - t0, 2))
            new = _stage_ids(base, app) - before
            # keep the LAST rep's stage summary (warmed JIT)
            stages[name] = _reduce_stage_summary(base, app, new)
            stages[name]["rows"] = int(row["rows"])
            stages[name]["entries"] = int(row["entries"])

    # data-side explanation: per-key weights
    ex = toks.select("doc_id", F.explode("tokens").alias("term"))
    kw = ex.groupBy("term").count()
    hot = kw.agg(F.max("count").alias("mx"), F.sum("count").alias("tot")) \
        .collect()[0]
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "n_docs": args.n_docs,
        "cpus": args.cpus,
        "docs_per_segment": args.docs_per_segment,
        "planted": "8 hot terms, each in ~50% of docs (sources.regime)",
        "max_key_entries": int(hot["mx"]),
        "total_entries": int(hot["tot"]),
        "max_key_fraction": round(hot["mx"] / hot["tot"], 4),
        "salted": {
            "wall_secs": walls["salted"],
            "wall_median_sec": med(walls["salted"]),
            **stages["salted"],
        },
        "naive_group_by_term": {
            "wall_secs": walls["naive"],
            "wall_median_sec": med(walls["naive"]),
            **stages["naive"],
        },
        "wall_ratio_naive_over_salted": round(
            med(walls["naive"]) / med(walls["salted"]), 2
        ),
        "commit": commit,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
