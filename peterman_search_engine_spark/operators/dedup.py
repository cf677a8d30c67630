"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale posture (the reason each exists):

* exact      — one hash-groupBy; at 100 TB this is a single shuffle on
               a well-distributed 128-bit key.
* MinHash+LSH— near-dup candidates WITHOUT the O(n²) cross join:
               shingle -> K minhashes -> band buckets -> self-join per
               bucket. Only bucket-colliding pairs are verified.
* SimHash    — one 64-bit (here 16-bit, configurable) signature per
               doc; near-dups differ in few bits. Signature build is a
               groupBy over (doc, bit) — fully distributed.
* n-gram Jaccard — exact verification metric, computed relationally
               (explode + join + count), only ever applied to
               candidate pairs or within small blocks.

Everything is Column-expression based (JVM) with md5-derived portable
hashes, so each operator has an exact DuckDB SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_expr
from ..functions.textstats import md5_long

DEFAULT_SHINGLE = 3


def _shingles(tokens_col):
    """All w-token shingles as space-joined strings (w=3)."""
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(1), F.greatest(n - (DEFAULT_SHINGLE - 1), F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens_col, i, DEFAULT_SHINGLE))
    )


def shingle_df(corpus: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct 3-token shingles of the analyzed
    (unstemmed) token stream."""
    toks = corpus.select("doc_id", tokens_expr("text").alias("toks"))
    return (
        toks.select("doc_id", F.explode(_shingles(F.col("toks"))).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def dedup_exact(corpus: DataFrame) -> DataFrame:
    """Exact dedup by full-text hash. Returns one row per distinct
    text: (text_hash, n_docs, keep_doc_id) where keep_doc_id is the
    smallest doc_id (the canonical survivor)."""
    return (
        corpus.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def minhash_signatures(corpus: DataFrame, *, num_hashes: int = 4) -> DataFrame:
    """MinHash signatures over 3-token shingles: signature k =
    min over shingles of md5_long(k || ':' || shingle). Returns
    (doc_id, mh_0..mh_{K-1}). Docs with no shingle are dropped."""
    sh = shingle_df(corpus)
    aggs = [
        F.min(md5_long(F.concat(F.lit(f"{k}:"), F.col("shingle")))).alias(f"mh_{k}")
        for k in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(corpus: DataFrame, *, num_hashes: int = 4) -> DataFrame:
    """LSH banding with 1-row bands: docs sharing ANY minhash value
    are candidates. Self-join per (band, value) bucket — never a full
    cross join. Returns (doc_a, doc_b) with doc_a < doc_b, distinct."""
    sig = minhash_signatures(corpus, num_hashes=num_hashes)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"mh_{k}").alias("val"))
                    for k in range(num_hashes)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    corpus: DataFrame,
    *,
    block_col: str | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact 3-gram Jaccard similarity for doc pairs, computed
    relationally: |A∩B| from a shingle self-join, |A∪B| = |A|+|B|−|A∩B|.
    ``block_col`` (e.g. 'source') restricts pairs to the same block —
    the blocking strategy that keeps this sub-quadratic at scale.
    Returns (doc_a, doc_b, jacc_e6 long) with jaccard > threshold."""
    base = corpus.select("doc_id", "text", *( [block_col] if block_col else [] ))
    sh = shingle_df(base)
    if block_col:
        sh = sh.join(base.select("doc_id", block_col), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jacc = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jacc_e6", F.round(jacc * 1_000_000).cast("long"))
        .filter(jacc > threshold)
        .select("doc_a", "doc_b", "jacc_e6")
    )


def simhash(corpus: DataFrame, *, bits: int = 16) -> DataFrame:
    """SimHash signature per doc over analyzed (unstemmed) tokens with
    multiplicity: bit b is 1 iff Σ_tokens (±1 by token-hash bit b) > 0.
    Returns (doc_id, simhash long).

    Single-pass: ONE aggregation over the token rows with ``bits``
    parallel sum expressions (bit b's ±1 is extracted from the token
    hash inline), then the signature assembles from the per-bit sums
    in a pure projection. Shuffle volume = |token rows| regardless of
    signature width — the earlier explode(sequence(0, bits-1)) form
    amplified every token row ×bits through the shuffle, which at a
    production 64-bit width is a 64× regression. Supports bits up to
    64 (bit 63 maps to the sign bit of the signed long signature)."""
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in [1, 64]")
    toks = corpus.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
    h = toks.select("doc_id", (md5_long(F.col("term"))).alias("h"))
    per_bit = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(bits):
        weight = (1 << b) if b < 63 else -(1 << 63)  # two's-complement bit 63
        sig = sig + F.when(F.col(f"s{b}") > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return per_bit.select("doc_id", sig.alias("simhash"))
