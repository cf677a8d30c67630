"""Collocation extraction: top-k adjacent-token bigrams by PMI.

A corpus-analysis operator for training-data pipelines (vocabulary
induction, multi-word-expression mining, boilerplate discovery). The
reference's analysis layer stops at unigram tokens
(``PunctuationTokenizer.java``); this computes, over the same analyzed
token stream (stop words removed, so bigrams span them — the standard
collocation convention):

    pmi(a,b) = ln( p(ab) / (p(a)·p(b)) ),
    p(ab) = c(ab)/T2,  p(a) = c(a)/T

with T = total tokens, T2 = total bigrams, and a minimum bigram count
to suppress noise pairs.

Scale posture: two exploded projections of the token arrays feeding
two hash aggregates (map-side partial combine), one broadcast-sized
join of bigram counts against the unigram count table restricted to
participating words, two scalar totals, TakeOrderedAndProject for the
top-k. No Python in the row path; everything is JVM array/agg
expressions. At 100 TB the bigram count table is the big intermediate
— it shuffles once on the bigram key, same shape as the index build's
term aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import tokenize_corpus


def bigram_pmi(
    corpus: DataFrame,
    *,
    min_count: int = 5,
    top_k: int | None = 20,
    stem: bool = False,
) -> DataFrame:
    """Top-k bigrams by PMI. Returns (w1, w2, n, pmi) ordered by
    (pmi desc, w1, w2); ``n`` is the bigram count."""
    t = tokenize_corpus(corpus, stem=stem).select("tokens")
    # adjacent pairs: zip tokens[0:len-1] with tokens[1:len]
    pairs = (
        t.select(
            F.expr("slice(tokens, 1, greatest(size(tokens) - 1, 0))").alias("_a"),
            F.expr("slice(tokens, 2, greatest(size(tokens) - 1, 0))").alias("_b"),
        )
        .select(F.explode(F.arrays_zip("_a", "_b")).alias("_p"))
        .select(F.col("_p._a").alias("w1"), F.col("_p._b").alias("w2"))
    )

    uni = (
        t.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    totals = t.agg(
        F.sum(F.size("tokens")).alias("t1"),
        F.sum(F.greatest(F.size("tokens") - 1, F.lit(0))).alias("t2"),
    ).collect()[0]
    t1, t2 = float(totals["t1"]), float(totals["t2"])

    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .withColumn(
            "pmi",
            F.log(
                (F.col("n") / F.lit(t2))
                / ((F.col("c1") / F.lit(t1)) * (F.col("c2") / F.lit(t1)))
            ),
        )
        .select("w1", "w2", "n", "pmi")
    )
    ranked = scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return ranked.limit(top_k) if top_k is not None else ranked
