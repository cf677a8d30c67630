"""A/B: block-max WAND + MaxScore vs the exhaustive BM25 plan in the
pruning regime (rare-AND-common query, gate open on real statistics).

Round-2 verdict follow-up: at sf0.1 the cost gate always routed to the
exhaustive plan (sum df over query terms << DEFAULT_PRUNE_MIN_ENTRIES)
so the pruned path had never been measured where it should win. This
script synthesises that regime deterministically
(``sources.regime``), checks the gate opens on the SHIPPED
configuration (no knob lowering — sum df over the 9 query terms is
~4*n_docs + df(rare) >= 1e7 at the default 2.6M docs), and measures
both plans interleaved (E,P,E,P,...) per the host-interference
protocol in BENCH/BASELINE.md.

Writes BENCH/wand_regime.json and prints one JSON line.

Usage::

    python scripts/wand_regime.py [--n-docs 2600000] [--reps 3]
        [--cpus 32] [--work-dir /tmp/pse_wand_regime] [--keep]

The index is rebuilt per invocation unless --keep finds an existing
build in --work-dir (same parquet layout as plans.checkpoint).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2_600_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--work-dir", default="/tmp/pse_wand_regime")
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing build in --work-dir")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from peterman_search_engine_spark.operators.wand import (
        bm25_topk_exhaustive,
        bm25_topk_wand,
    )
    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.sources.regime import (
        build_regime_index,
        regime_query,
    )

    spark = get_spark(
        "wand-regime", master=f"local[{args.cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    if args.keep and os.path.exists(f"{args.work_dir}/postings"):
        from peterman_search_engine_spark.operators.indexer import (
            DEFAULT_BLOCK_SIZE,
            InvertedIndex,
        )
        from pyspark.sql import functions as F

        doc_stats = spark.read.parquet(f"{args.work_dir}/doc_stats")
        n_docs = doc_stats.count()
        avg_len = float(doc_stats.agg(F.avg("doc_len")).collect()[0][0])
        index = InvertedIndex(
            postings=spark.read.parquet(f"{args.work_dir}/postings"),
            term_stats=spark.read.parquet(f"{args.work_dir}/term_stats"),
            doc_stats=doc_stats,
            n_docs=n_docs,
            avg_len=avg_len,
            positional=False,
            stem=False,
            block_size=DEFAULT_BLOCK_SIZE,
        )
    else:
        index = build_regime_index(spark, args.work_dir, args.n_docs)
    build_sec = round(time.perf_counter() - t0, 2)

    q = regime_query()

    # gate + prune audit (untimed): the shipped config must open the
    # gate on its own statistics — a gated_exhaustive here means the
    # regime is mis-sized and the A/B below would compare a plan to
    # itself.
    _, stats = bm25_topk_wand(index, q, args.k, return_stats=True)
    if stats.get("gated_exhaustive"):
        raise SystemExit(f"gate did not open: {stats}")

    # correctness: pruned == exhaustive on this corpus
    ex = [
        (r.doc_id, round(r.score, 9))
        for r in bm25_topk_exhaustive(index, q, args.k).collect()
    ]
    pr = [
        (r.doc_id, round(r.score, 9))
        for r in bm25_topk_wand(index, q, args.k).collect()
    ]
    assert ex == pr, (ex, pr)

    # interleaved timed reps (host-interference protocol)
    e_secs, p_secs = [], []
    for _ in range(args.reps):
        t = time.perf_counter()
        bm25_topk_exhaustive(index, q, args.k).collect()
        e_secs.append(round(time.perf_counter() - t, 3))
        t = time.perf_counter()
        bm25_topk_wand(index, q, args.k).collect()
        p_secs.append(round(time.perf_counter() - t, 3))

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "n_docs": args.n_docs,
        "query": q,
        "k": args.k,
        "cpus": args.cpus,
        "build_sec": build_sec,
        "gate": {k: v for k, v in stats.items() if k != "seed_segments"},
        "exhaustive_secs": e_secs,
        "pruned_secs": p_secs,
        "exhaustive_median_sec": med(e_secs),
        "pruned_median_sec": med(p_secs),
        "speedup_median": round(med(e_secs) / med(p_secs), 3),
        "results_match": True,
        "commit": commit,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "wand_regime.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
