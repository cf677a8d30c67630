"""PageRank + combined ranking — SURVEY.md §2.3 Q14-Q16.

Reference parity (``search/IcsSearchEngine.java:63-106``):
Jacobi iteration ``PR(p) = (1-d) + d·Σ PR_prev(q)/outdeg(q)`` with
d = 0.85, prev scores initialized to 1.0, UNNORMALIZED (no ÷N), a
fixed iteration count and no convergence test. Nodes = every id
appearing in the edge list; dangling nodes contribute nothing.

Spark-first: each sweep is one join + one aggregation. ``prev/outdeg``
is precomputed once per sweep on the (small) rank table; the edge
table never moves — Catalyst broadcasts the rank side when it fits,
else AQE picks a shuffle join. Lineage is cut with localCheckpoint
every few sweeps so 100-iteration runs (the reference's
IcsSearchEngineTest budget) don't blow the plan stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
CHECKPOINT_EVERY = 8


def pagerank(
    edges: DataFrame,
    num_iterations: int,
    *,
    damping: float = DAMPING,
    checkpoint_every: int = CHECKPOINT_EVERY,
    num_partitions: int | None = None,
) -> DataFrame:
    """edges(src int, dst int) -> (node int, pr double).

    Per-sweep plan: ONE join (ranks into the stationary co-partitioned
    edge table) + ONE aggregation. Three structural savings vs the
    naive loop, all of which matter over the reference's 100-iteration
    budget (IcsSearchEngineTest.java:33-54):

    * the edge table is hash-repartitioned by ``src`` ONCE and cached —
      every sweep's join re-uses that layout, so only the (much
      smaller) rank table moves through a shuffle per sweep;
    * nodes with no incoming edge have PR = (1-d) constant after the
      first sweep, so they are folded in as a cached constant UNION
      instead of a per-sweep left join over all nodes;
    * the sweep partition count is SIZE-AWARE: an iterative job pays
      per-task scheduling overhead ``iterations × stages × tasks``
      times, so small graphs run on few fat partitions (~200k edges
      each) while large graphs inherit the session's parallelism —
      measured 2× on the 600k-node bench graph at 32 cores. The tuned
      count applies to every sweep (the final ranks are materialized
      inside the tuned scope via localCheckpoint).

    NOTE the tuning works by setting ``spark.sql.shuffle.partitions``
    for the DURATION OF THIS CALL (restored in ``finally``): the
    per-sweep ``groupBy("dst")`` must keep its map-side partial
    aggregation ahead of the exchange, which an explicit
    ``repartition(n, "dst")`` before the groupBy would forfeit — so
    the exchange width has to come from the session conf. Queries run
    CONCURRENTLY on the same SparkSession during a pagerank call will
    plan their shuffles with the tuned count; callers who share a
    session across threads should pass ``num_partitions`` equal to the
    session default or serialize access. If the session conf value is
    non-numeric (a deployment override like "auto"), size tuning is
    skipped and the conf is left untouched.
    """
    spark = edges.sparkSession
    conf_parts = spark.conf.get("spark.sql.shuffle.partitions")
    edges = edges.select("src", "dst")
    try:
        session_parts = int(conf_parts)
    except (TypeError, ValueError):
        session_parts = None
    if num_partitions is None:
        if session_parts is None:
            num_partitions = None  # unparseable conf: leave it alone
        else:
            n_edges = edges.count()
            num_partitions = max(8, min(session_parts, n_edges // 200_000))
    if num_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    try:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionAll(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        # fold outdeg into the stationary edge table ONCE, co-partitioned
        # with the per-sweep join key (explicit numPartitions => exempt
        # from AQE coalescing, so the layout is stable across sweeps)
        edges_od = edges.join(outdeg, "src").select("src", "dst", "outdeg")
        if num_partitions is not None:
            edges_od = edges_od.repartition(num_partitions, "src")
        else:
            edges_od = edges_od.repartition("src")
        edges_od = edges_od.cache()
        # nodes that never appear as a dst: PR(p) = (1-d) + d*0, constant
        no_in = (
            nodes.join(
                edges.select(F.col("dst").alias("node")).distinct(),
                "node",
                "left_anti",
            )
            .withColumn("pr", F.lit(1.0 - damping))
            .cache()
        )
        ranks = nodes.withColumn("pr", F.lit(1.0))
        for i in range(num_iterations):
            contrib = (
                edges_od.join(ranks, edges_od.src == ranks.node)
                .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(1.0 - damping) + F.lit(damping) * F.col("s")).alias("pr"),
            ).unionAll(no_in)
            if (i + 1) % checkpoint_every == 0 and i + 1 < num_iterations:
                ranks = ranks.localCheckpoint(eager=True)
        # materialize while the tuned partitioning is in force
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        if num_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", conf_parts)
    return ranks


def pagerank_scores(edges: DataFrame, num_iterations: int) -> DataFrame:
    """Q15 getPageRankScores: all (node, pr) sorted desc
    (IcsSearchEngine.java:112-121), deterministic tiebreak on node."""
    return pagerank(edges, num_iterations).orderBy(F.desc("pr"), F.asc("node"))


def combined_search(
    scored: DataFrame,
    ranks: DataFrame,
    *,
    pr_weight: float,
    top_k: int | None,
) -> DataFrame:
    """Q16 combined ranking (IcsSearchEngine.java:138-164):
    combined = text_score + pr_weight · pagerank, over ALL text
    matches (the reference fetches searchTfIdf(query, null)); docs
    without a rank entry contribute 0. pr_weight=0 must equal the
    pure text ranking exactly (IcsSearchEngineTest.java:119-133).

    scored: (doc_id, score); ranks: (node, pr).
    Returns (doc_id, score) with the combined score.
    """
    out = (
        scored.join(ranks, scored.doc_id == ranks.node, "left")
        .select(
            "doc_id",
            (
                F.col("score")
                + F.lit(float(pr_weight)) * F.coalesce("pr", F.lit(0.0))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return out.limit(top_k) if top_k is not None else out
