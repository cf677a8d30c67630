"""Two-cluster-size scaling evidence (sandbox proxy, per BASELINE.md).

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors. No real cluster exists in this sandbox, so the proxy is:
the SAME spark-submit index-build job on the SAME input at local[8]
and local[32] (true 4x physical cores on this 32-core box), comparing
turns-indexed/sec.

Usage::

    python scripts/scaling.py [--tier bench] [--runs 1]

Writes the result table to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def prepare_input(tier: str, path: str, replicate: int = 1) -> None:
    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.sources.transcripts import generate_transcripts

    spark = get_spark("pse-scaling-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = generate_transcripts(spark, tier, num_partitions=64)
    if replicate > 1:
        # distributed deterministic scale-up: N copies with remapped
        # conv_ids (driver-side generation of >10^6 rows would be the
        # bottleneck otherwise)
        from pyspark.sql import functions as F

        rep = spark.range(replicate).select(F.col("id").cast("string").alias("_r"))
        df = (
            df.crossJoin(rep)
            .withColumn("conv_id", F.concat_ws("r", "conv_id", "_r"))
            .drop("_r")
            .repartition(128)
        )
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def run_build(zip_path: str, input_path: str, cores: int, out_dir: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        # must be on the submit line: session-builder driver-memory is
        # ignored once the JVM is up, and 32 concurrent tasks in the
        # default 1g heap just GC-thrash
        "--driver-memory", "48g",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "build_index.py"),
        "--input", input_path,
        "--output", out_dir,
        "--docs-per-segment", "100000",
        "--one-shot",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               PSE_SHUFFLE_PARTITIONS=str(cores * 2))
    res = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="bench")
    ap.add_argument("--replicate", type=int, default=10,
                    help="distributed input scale-up factor")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="pse_scaling_")
    input_path = os.path.join(work, "transcripts")
    zip_path = os.path.join(work, "pse.zip")
    subprocess.run(
        ["zip", "-qr", zip_path, "peterman_search_engine_spark",
         "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )
    prepare_input(args.tier, input_path, args.replicate)

    results: dict[int, dict] = {}
    for cores in (8, 32):
        best = None
        for _ in range(args.runs):
            out_dir = os.path.join(work, f"idx_{cores}")
            shutil.rmtree(out_dir, ignore_errors=True)
            rep = run_build(zip_path, input_path, cores, out_dir)
            if best is None or rep["build_wall_sec"] < best["build_wall_sec"]:
                best = rep
        results[cores] = best

    thr8 = results[8]["docs_per_sec"]
    thr32 = results[32]["docs_per_sec"]
    eff = (thr32 / thr8) / 4.0
    summary = {
        "tier": args.tier,
        "n_turns": results[32]["n_docs"],
        "local8_wall_sec": results[8]["build_wall_sec"],
        "local8_turns_per_sec": thr8,
        "local32_wall_sec": results[32]["build_wall_sec"],
        "local32_turns_per_sec": thr32,
        "scaling_efficiency_8_to_32": round(eff, 4),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            "# BENCH/BASELINE — two-parallelism scaling evidence\n\n"
            "Sandbox proxy for the north rule's N -> 4N executor\n"
            "criterion (no real cluster available): the SAME\n"
            "`spark-submit --py-files` index-build job\n"
            "(`jobs/build_index.py --one-shot`) on the SAME pre-written\n"
            f"parquet input (synthetic transcript tier `{args.tier}`,\n"
            f"{summary['n_turns']} turns, generation excluded from the\n"
            "timed window via localCheckpoint) at `local[8]` and\n"
            "`local[32]` on a 32-physical-core box — a true 4x core\n"
            "ratio. Timing starts after input materialization and ends\n"
            "when postings/term_stats/doc_stats parquet writes return.\n\n"
            "| parallelism | build wall (s) | turns/sec |\n"
            "|---|---|---|\n"
            f"| local[8] | {summary['local8_wall_sec']} | {thr8} |\n"
            f"| local[32] | {summary['local32_wall_sec']} | {thr32} |\n\n"
            f"**Scaling efficiency (8 -> 32 cores) = (thr32/thr8)/4 = "
            f"{summary['scaling_efficiency_8_to_32']}** "
            f"(target >= 0.8)\n\n"
            "Reproduce: `python scripts/scaling.py --tier "
            f"{args.tier} --replicate {args.replicate}`\n"
        )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
