"""spark-submit entrypoint: query a persisted index.

    spark-submit --py-files pse.zip jobs/query.py \
        --index /tmp/pse_index --mode bm25 --k 10 spark merge

Modes: and, or, phrase, tfidf, bm25, wand (block-max-pruned BM25),
bm25f (fielded), fuzzy, wildcard, suggest, lm (LM-Dirichlet),
regex (whole-term dictionary regex), bool (full query string —
quote it: --mode bool '(spark AND merge) OR wind*'), span (ordered
span-near, --gap positions between consecutive terms), spell
(did-you-mean over the dictionary).
Prints one JSON line with the result rows and, for wand, the pruning
stats (incl. the cost-gate / essential-df routing decision).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--mode", default="bm25",
                    choices=["and", "or", "phrase", "tfidf", "bm25", "wand",
                             "bm25f", "fuzzy", "wildcard", "suggest", "bool",
                             "lm", "regex", "span", "spell"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--gap", type=int, default=3,
                    help="span mode: max positions between consecutive terms")
    ap.add_argument("--master", default=None)
    ap.add_argument("terms", nargs="+")
    args = ap.parse_args()

    from peterman_search_engine_spark.plans.session import get_spark
    from peterman_search_engine_spark.plans.checkpoint import load_index
    from peterman_search_engine_spark.operators import query as Q
    from peterman_search_engine_spark.operators.wand import bm25_topk_wand

    spark = get_spark("pse-query", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    idx = load_index(spark, args.index)

    stats = None
    if args.mode == "and":
        df = Q.search_and(idx, args.terms)
    elif args.mode == "or":
        df = Q.search_or(idx, args.terms)
    elif args.mode == "phrase":
        df = Q.search_phrase(idx, args.terms)
    elif args.mode == "tfidf":
        df = Q.search_tfidf(idx, args.terms, args.k)
    elif args.mode == "bm25":
        df = Q.search_bm25(idx, args.terms, args.k)
    elif args.mode == "bm25f":
        from peterman_search_engine_spark.operators.ranking import search_bm25f

        df = search_bm25f(idx, args.terms, args.k)
    elif args.mode == "fuzzy":
        df = Q.search_fuzzy(idx, args.terms[0])
    elif args.mode == "wildcard":
        df = Q.search_wildcard(idx, args.terms[0])
    elif args.mode == "suggest":
        df = Q.suggest_terms(idx, args.terms[0], args.k)
    elif args.mode == "bool":
        from peterman_search_engine_spark.operators.boolparser import search_boolean

        df = search_boolean(idx, " ".join(args.terms))
    elif args.mode == "lm":
        from peterman_search_engine_spark.operators.ranking import (
            search_lm_dirichlet,
        )

        df = search_lm_dirichlet(idx, args.terms, args.k)
    elif args.mode == "regex":
        df = Q.search_regex(idx, args.terms[0], args.k)
    elif args.mode == "span":
        df = Q.search_span_near(idx, args.terms, args.gap)
    elif args.mode == "spell":
        df = Q.suggest_spelling(idx, args.terms[0], top_k=args.k)
    else:
        df, stats = bm25_topk_wand(idx, args.terms, args.k, return_stats=True)

    rows = [r.asDict() for r in df.limit(max(args.k, 100)).collect()]
    out = {"mode": args.mode, "terms": args.terms, "rows": rows}
    if stats:
        out["wand_stats"] = stats
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
