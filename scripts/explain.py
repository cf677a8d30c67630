"""Physical-plan evidence: print the formatted plans behind the
performance claims in docs/SCALE.md.

Checks (each printed with the relevant plan excerpt):

1. term-filter PUSHDOWN to the parquet scan of a persisted index
   (``PushedFilters: [In(term, ...)]``) — the distributed analogue of
   the reference's per-segment dictionary skip;
2. BROADCAST of the (tiny) query-term table in the BM25 scoring join;
3. top-k as ``TakeOrderedAndProject`` (per-partition bounded heap +
   driver merge — the reference's MinMaxPriorityQueue, distributed);
4. the aligned posting build contains NO Exchange (zero-shuffle);
5. WholeStageCodegen covers the JVM doc-length pass.

Usage: ``python scripts/explain.py [out.md]`` — writes markdown to
stdout or the given file. Run from the repo root.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from peterman_search_engine_spark.functions.analysis import tokens_expr
    from peterman_search_engine_spark.operators import query as Q
    from peterman_search_engine_spark.operators.indexer import (
        postings_from_aligned_corpus,
    )
    from peterman_search_engine_spark.plans.checkpoint import (
        build_index_checkpointed,
        load_index,
    )
    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.sources.adapters import corpus_from_documents

    spark = get_spark("pse-explain", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = corpus_from_documents(docs)

    idx_dir = tempfile.mkdtemp(prefix="pse_explain_idx_")
    build_index_checkpointed(
        corpus, idx_dir, stem=False, docs_per_segment=200, segments_per_group=8
    )
    idx = load_index(spark, idx_dir)

    sections: list[tuple[str, str, list[str]]] = []

    bm25 = Q.bm25_scores(idx, ["spark", "merge"])
    plan = formatted(bm25.orderBy(F.desc("score"), F.asc("doc_id")).limit(10))
    sections.append((
        "BM25 top-k over the persisted index",
        plan,
        ["PushedFilters", "BroadcastHashJoin", "TakeOrderedAndProject"],
    ))

    aligned = postings_from_aligned_corpus(
        corpus.repartitionByRange(4, "doc_id"), avg_len=20.0, stem=False
    )
    aligned_plan = formatted(aligned)
    sections.append((
        "Aligned posting build — the ONLY Exchange is the input "
        "range-partition (the docmap invariant); the build itself "
        f"(scan -> MapInArrow) is shuffle-free. Exchange count: "
        f"{aligned_plan.count('(2) Exchange') + aligned_plan.count('(3) Exchange')}",
        aligned_plan,
        ["MapInArrow"],
    ))

    prefix = Q.search_prefix(idx, "st")
    sections.append((
        "Prefix search — StringStartsWith pushed into the parquet "
        "term scan; segment files are term-sorted, so row-group "
        "min/max statistics make this a dictionary range scan",
        formatted(prefix),
        ["StartsWith"],
    ))

    from peterman_search_engine_spark.operators.boolparser import search_boolean
    from peterman_search_engine_spark.operators.ranking import (
        grouped_topk,
        search_bm25f,
    )

    bm25f = search_bm25f(idx, ["spark", "merge"], 10)
    sections.append((
        "BM25F fielded top-k — the plain-BM25 plan plus one JVM array "
        "filter over the stored position lists (no re-tokenization, "
        "no Python); same pushdown/broadcast/top-k markers",
        formatted(bm25f),
        ["PushedFilters", "BroadcastHashJoin", "TakeOrderedAndProject"],
    ))

    grouped = grouped_topk(idx, ["vector", "stream"], docs, "source", 5)
    sections.append((
        "Grouped (conversation-rollup) retrieval — scored docs join "
        "the (doc_id, group) projection, hash aggregate on group, "
        "bounded top-k",
        formatted(grouped),
        ["HashAggregate", "TakeOrderedAndProject"],
    ))

    boolq = search_boolean(idx, "(spark AND merge) OR (vector AND NOT stream)")
    sections.append((
        "Boolean query string — set algebra as semi/anti hash joins; "
        "every leaf keeps the term-IN parquet pushdown",
        formatted(boolq),
        ["LeftSemi", "LeftAnti", "PushedFilters"],
    ))

    from peterman_search_engine_spark.operators.ranking import (
        search_lm_dirichlet,
    )

    lm = search_lm_dirichlet(idx, ["spark", "merge"], 10)
    sections.append((
        "LM-Dirichlet top-k — identical shape to the BM25 plan "
        "(postings IN-scan, broadcast O(|q|) term table, hash "
        "aggregate, bounded top-k); the unmatched-term mass is a "
        "closed-form column, not extra rows",
        formatted(lm),
        ["PushedFilters", "BroadcastHashJoin", "TakeOrderedAndProject"],
    ))

    rx = Q.search_regex(idx, "(merg|wind)[a-z]*", 10)
    sections.append((
        "Regex dictionary search — ONE distributed postings scan with "
        "the anchored regex as a post-scan filter (regex can't "
        "parquet-push; column pruning keeps the scan narrow), no "
        "driver round-trip for the matched-term set",
        formatted(rx),
        ["RLIKE", "HashAggregate", "TakeOrderedAndProject"],
    ))

    from peterman_search_engine_spark.operators.curation import (
        curation_pipeline,
    )

    docs_src = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    pipe = curation_pipeline(
        docs_src,
        docs_src.filter(F.col("doc_id") % 53 == 0),
        strata_col="source",
        rates={"src0": 0.5},
    )
    sections.append((
        "Curation pipeline — dedup hash-agg + two semi-joins; the "
        "quality floor and the deterministic sample hash are plain "
        "Filter predicates fused into the scan (no extra pass over "
        "text), and decontamination shingles only surviving docs",
        formatted(pipe),
        ["HashAggregate", "LeftSemi", "Filter"],
    ))

    span = Q.search_span_near(idx, ["spark", "merge"], 3)
    sections.append((
        "Ordered span-near — the phrase partial-decode plan (candidate "
        "docs from doc_ids alone, per-candidate position slices into "
        "one Arrow decode) with a nested ordered-window exists as the "
        "final JVM filter; postings keep the term-IN parquet pushdown",
        formatted(span),
        ["PushedFilters", "ArrowEvalPython", "HashAggregate"],
    ))

    from peterman_search_engine_spark.operators import similarity as SIM
    from peterman_search_engine_spark.sources.clustered import clustered_embeddings

    emb = clustered_embeddings(spark, n_clusters=16, per_cluster=16, n_noise=64)
    ann_dir = tempfile.mkdtemp(prefix="pse_explain_ann_")
    SIM.build_ivf(emb, f"{ann_dir}/ivf", n_cells=16)
    SIM.build_lsh(emb, f"{ann_dir}/lsh", dim=64)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 20).collect()[0]["embedding"]]
    ivf_p = SIM.ivf_topk_persisted(spark, f"{ann_dir}/ivf", qv, k=10, n_probe=2)
    sections.append((
        "Persisted IVF probe — cell assignment paid at build "
        "(build_ivf writes vectors PARTITIONED BY cell); the probe is "
        "one scan whose PartitionFilters prune to the n_probe cell "
        "directories, then exact cosine + bounded top-k",
        formatted(ivf_p),
        ["PartitionFilters", "cell#", "TakeOrderedAndProject"],
    ))

    lsh_p = SIM.lsh_multiprobe_persisted(spark, f"{ann_dir}/lsh", qv, k=10, radius=1)
    sections.append((
        "Persisted multi-probe LSH — bucket-id enumeration "
        "(C(planes,<=r) ids computed driver-side) becomes "
        "PartitionFilters over the bucket-partitioned vector table: "
        "9 of 256 directories at radius 1 instead of a full-column "
        "bit_count filter",
        formatted(lsh_p),
        ["PartitionFilters", "bucket#", "TakeOrderedAndProject"],
    ))

    doc_stats = corpus.select("doc_id", F.size(tokens_expr("text")).alias("doc_len"))
    sections.append((
        "JVM doc-length pass — single columnar scan + projection; the "
        "stop-word filter compiles to an O(1) INSET hash probe per "
        "token. (Higher-order array functions are interpreted, not "
        "whole-stage-codegen'd, but stay JVM-side.)",
        formatted(doc_stats),
        ["INSET", "ColumnarToRow"],
    ))

    out = ["# Physical plans (generated by scripts/explain.py)\n"]
    for title, plan, expects in sections:
        out.append(f"\n## {title}\n")
        out.append("Expected markers: " + "; ".join(expects) + "\n")
        for marker in expects:
            key = marker.split(":")[0].split(" ")[0]
            hit = key in plan
            out.append(f"- `{key}` present: **{hit}**\n")
        out.append("\n```\n" + plan.strip() + "\n```\n")
    text = "".join(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(text)
        print(f"wrote {sys.argv[1]}")
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
