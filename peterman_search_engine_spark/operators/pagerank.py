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
) -> DataFrame:
    """edges(src int, dst int) -> (node int, pr double)."""
    edges = edges.select("src", "dst").cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # fold outdeg into the stationary edge table ONCE — each sweep is
    # then a single join + aggregation instead of two joins
    edges_od = (
        edges.join(outdeg, "src").select("src", "dst", "outdeg").cache()
    )
    ranks = nodes.withColumn("pr", F.lit(1.0))
    for i in range(num_iterations):
        contrib = (
            edges_od.join(ranks, edges_od.src == ranks.node)
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias(
                "pr"
            ),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < num_iterations:
            ranks = ranks.localCheckpoint(eager=True)
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
