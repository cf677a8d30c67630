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
    """All w-token shingles as space-joined strings (w=3). Docs with
    fewer than w tokens yield an EMPTY array — F.sequence(1, hi)
    counts DOWN when hi < 1 ([1, 0]), and slice(col, 0, w) then
    throws under ANSI mode, so the short-doc case must be guarded
    explicitly (matches the oracle's positional self-join, which
    simply produces no rows for short docs)."""
    n = F.size(tokens_col)
    idx = F.when(
        n >= DEFAULT_SHINGLE,
        F.sequence(F.lit(1), n - (DEFAULT_SHINGLE - 1)),
    ).otherwise(F.expr("array()").cast("array<int>"))
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


def lsh_candidate_pairs(
    corpus: DataFrame, *, num_hashes: int = 4, rows_per_band: int = 1
) -> DataFrame:
    """LSH banding: the ``num_hashes`` minhashes are split into
    b = num_hashes / rows_per_band bands of r = ``rows_per_band``
    rows; two docs are candidates iff they agree on EVERY row of at
    least one band. A pair with Jaccard similarity s collides with
    probability 1 - (1 - s^r)^b — r tunes precision (r=1 fires on any
    single hash collision; larger r suppresses low-similarity noise),
    b tunes recall. Self-join per (band, value) bucket — never a full
    cross join; bucket values hash uniformly, so the join keys carry
    no inherent skew beyond true duplicate mass. Returns
    (doc_a, doc_b) with doc_a < doc_b, distinct."""
    if num_hashes % rows_per_band:
        raise ValueError("num_hashes must be a multiple of rows_per_band")
    sig = minhash_signatures(corpus, num_hashes=num_hashes)
    nbands = num_hashes // rows_per_band

    def band_val(b: int):
        return F.concat_ws(
            "|",
            *[
                F.col(f"mh_{b * rows_per_band + j}").cast("string")
                for j in range(rows_per_band)
            ],
        )

    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_val(b).alias("val"))
                    for b in range(nbands)
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


def connected_components(
    pairs: DataFrame,
    *,
    max_rounds: int = 16,
) -> DataFrame:
    """Connected components of an undirected pair graph —
    ``(doc_a, doc_b)`` rows -> ``(doc_id, cluster_id)`` where
    cluster_id is the smallest doc_id in the component. Nodes are the
    doc_ids appearing in ``pairs``; join the result back to the corpus
    for singleton handling (see :func:`dedup_clusters`).

    This is the canonical step AFTER candidate-pair generation
    (LSH/SimHash/Jaccard emit PAIRS; dedup needs CLUSTERS with one
    canonical survivor each — duplicates are transitive in practice).

    Scale posture: alternating **large-star / small-star** (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    converges in O(log^2 n) rounds on ANY graph shape (a naive
    min-label propagation needs diameter rounds, which a chain of
    near-dups can push to O(n)). Each half-round is one groupBy-min
    plus a distinct — partial aggregation handles hub skew, nothing is
    ever collected to the driver, and no collect_list materializes a
    hub's full neighbor list on one executor. Convergence is detected
    with an order-independent aggregate fingerprint of the edge set
    (count + sums of per-edge hashes), one metadata-sized job per
    round. The edge set is ``localCheckpoint``-ed EVERY round: each
    star references its input subtree four times (sym-union feeds
    both the min-agg and the filtered side), so an uncut lineage
    grows 16x per round — exponential plan size, unlike PageRank's
    linear sweep stack.
    """
    edges = (
        pairs.select(
            F.col("doc_a").cast("long").alias("u"),
            F.col("doc_b").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # m(u) = min over Γ(u) ∪ {u}; connect the chosen neighbor side
        # of each star to m(u). large-star: strictly larger neighbors;
        # small-star: smaller-or-equal neighbors (plus u itself).
        und = _sym(e)
        mins = (
            und.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        side = und.filter(
            (F.col("v") > F.col("u")) if large else (F.col("v") <= F.col("u"))
        )
        out = side.join(mins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        out = out.union(mins.select(F.col("u"), F.col("m").alias("v")))
        return out.filter(F.col("u") != F.col("v")).distinct()

    def _fingerprint(e: DataFrame):
        # order-independent, ANSI-safe (pmod keeps each addend < 2^31
        # so the sum cannot overflow long before ~2^32 edges; two
        # independent moduli make a collision across rounds vanishingly
        # unlikely, and the data is deterministic anyway)
        return tuple(
            e.agg(
                F.count("*"),
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2147483647))),
                F.sum(F.pmod(F.xxhash64("v", "u"), F.lit(2147483629))),
            ).collect()[0]
        )

    fp_prev = None
    converged = False
    for _ in range(max_rounds):
        edges = _star(edges, large=True)
        edges = _star(edges, large=False).localCheckpoint(eager=True)
        fp = _fingerprint(edges)
        if fp == fp_prev:
            converged = True
            break
        fp_prev = fp
    if not converged:
        # an unconverged edge set can SPLIT one true component into
        # several labels — silently returning that would be wrong data
        # (ADVICE r2). O(log^2 n) theory puts 16 rounds at ~10^4
        # components-of-chains; a legitimate graph that needs more gets
        # a bigger budget, not silently split clusters.
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; rerun with a larger max_rounds"
        )
    # converged edge set is a union of stars pointing at component
    # minima; a node's label is its smallest neighbor (or itself for
    # the minimum node of each component)
    und = _sym(edges)
    return (
        und.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("doc_id"),
            F.least(F.col("mn"), F.col("u")).alias("cluster_id"),
        )
    )


def dedup_clusters(corpus: DataFrame, *, num_hashes: int = 4) -> DataFrame:
    """End-to-end near-dup clustering over a corpus: LSH candidate
    pairs -> connected components -> one row per doc
    ``(doc_id, cluster_id)``; docs in no candidate pair are singleton
    clusters of themselves. Downstream dedup keeps
    ``doc_id == cluster_id`` rows (the canonical survivor per
    cluster). The pair graph is metadata-sized relative to the corpus
    (only bucket-colliding docs appear), so the component iteration
    never touches document text."""
    pairs = lsh_candidate_pairs(corpus, num_hashes=num_hashes)
    comp = connected_components(pairs)
    return (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
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
