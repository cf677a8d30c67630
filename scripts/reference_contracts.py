"""Run the reference's quantitative performance contracts against this
engine and report measured-vs-budget (see BASELINE.md - the reference
publishes no benchmark numbers; its JUnit timeouts and the compression
inequality are the only contracts).

Writes BENCH/CONTRACTS.md. Usage: ``python scripts/reference_contracts.py``.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from peterman_search_engine_spark.functions.analysis import word_break
    from peterman_search_engine_spark.functions.wordbreak import DEMO_FREQ
    from peterman_search_engine_spark.operators import query as Q
    from peterman_search_engine_spark.operators.indexer import build_index
    from peterman_search_engine_spark.operators.pagerank import (
        combined_search,
        pagerank,
    )
    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.sources.adapters import corpus_from_transcripts
    from peterman_search_engine_spark.sources.graph import generate_edges
    from peterman_search_engine_spark.sources.transcripts import generate_transcripts

    spark = get_spark("pse-contracts")
    spark.sparkContext.setLogLevel("ERROR")
    rows: list[tuple[str, str, float, float]] = []  # name, config, budget, measured

    # --- contract: index 100,000 documents <= 600 s (Team3StressTest)
    t = generate_transcripts(spark, "bench")  # 600k turns
    corpus100k = (
        corpus_from_transcripts(t).filter(F.col("doc_id") < 100_000)
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    idx = build_index(corpus100k, stem=True, positional=True, docs_per_segment=5000)
    idx.postings.write.mode("overwrite").parquet("/tmp/pse_contract_idx")
    dt = time.perf_counter() - t0
    rows.append(("index 100,000 docs (Team3StressTest)", "stem+positional", 600.0, dt))

    # --- contract: compression ratio > 1.5x naive (Team5IndexCompressionTest;
    # byte-based here: naive = 4 B/posting vs delta+varint blob bytes)
    agg = (
        spark.read.parquet("/tmp/pse_contract_idx")
        .agg(
            (F.sum("df") * 4).alias("naive"),
            F.sum(F.length("blob")).alias("blob"),
        )
        .collect()[0]
    )
    ratio = float(agg["naive"]) / float(agg["blob"])
    rows.append(
        ("posting compression naive/compressed (Team5)", "delta+varint", 1.5, ratio)
    )

    # --- contract: word-break a ~900-char no-space string <= 20 s
    # (WordBreakTokenizerTest.java:24-45 uses the full 82,765-word
    # dictionary; use it when the reference tree is present, else the
    # demo dict)
    import os

    ref_dict = "/root/reference/src/main/resources/cs221_frequency_dictionary_en.txt"
    if os.path.exists(ref_dict):
        from peterman_search_engine_spark.functions.wordbreak import (
            load_frequency_dict,
        )

        freq = load_frequency_dict(ref_dict)
        dict_label = f"DP, {len(freq)}-word reference dict"
    else:
        freq = DEMO_FREQ
        dict_label = "DP, demo dict"
    words, s = [], ""
    i = 0
    vocab = sorted(w for w in freq if len(w) > 2)
    while len(s) < 900:
        w = vocab[(i * 37) % len(vocab)]
        words.append(w)
        s += w
        i += 1
    t0 = time.perf_counter()
    toks = word_break(s, freq)
    dt = time.perf_counter() - t0
    assert toks, "word break produced nothing"
    rows.append(
        (f"word-break {len(s)}-char no-space string", dict_label, 20.0, dt)
    )

    # --- contract: index corpus + PageRank(100 iters) + 3 combined
    # queries <= 900 s (IcsSearchEngineTest)
    corpus = corpus_from_transcripts(t).filter(F.col("doc_id") < 20_000).localCheckpoint(
        eager=True
    )
    t0 = time.perf_counter()
    idx2 = build_index(corpus, stem=False, positional=False, docs_per_segment=2000)
    idx2.postings = idx2.postings.localCheckpoint(eager=True)
    idx2.doc_stats = idx2.doc_stats.localCheckpoint(eager=True)
    idx2.term_stats = idx2.term_stats.localCheckpoint(eager=True)
    ranks = pagerank(generate_edges(spark, 20_000), 100).localCheckpoint(eager=True)
    for terms in (["spark"], ["merge", "window"], ["vector", "stream"]):
        scored = Q.tfidf_scores(idx2, terms)
        combined_search(scored, ranks, pr_weight=0.5, top_k=10).collect()
    dt = time.perf_counter() - t0
    rows.append(
        ("index 20k docs + PageRank(100 iters) + 3 combined queries "
         "(IcsSearchEngineTest)", "d=0.85, unnormalized", 900.0, dt)
    )

    md = os.path.join(REPO, "BENCH", "CONTRACTS.md")
    with open(md, "w") as f:
        f.write(
            "# Reference performance contracts — measured on this engine\n\n"
            "The reference's only quantitative performance statements are\n"
            "JUnit budgets and one compression inequality (BASELINE.md).\n"
            "Each is re-run here in its closest Spark-native shape on\n"
            "local[32].\n\n"
            "| contract | config | budget | measured | margin |\n"
            "|---|---|---|---|---|\n"
        )
        for name, cfg, budget, measured in rows:
            if "compression" in name:
                f.write(
                    f"| {name} | {cfg} | ratio > {budget} | "
                    f"ratio = {measured:.2f} | "
                    f"{measured/budget:.1f}x over the floor |\n"
                )
            else:
                f.write(
                    f"| {name} | {cfg} | <= {budget:.0f} s | "
                    f"{measured:.2f} s | {budget/measured:.0f}x faster |\n"
                )
    print(f"wrote {md}")
    for r in rows:
        print(r)
    spark.stop()


if __name__ == "__main__":
    main()
