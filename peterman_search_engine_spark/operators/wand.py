"""Block-max WAND top-k pruning (north-star addition).

No reference counterpart — the closest analogue is the per-segment
dictionary skip (``InvertedIndexManager.java:390, 617``). The index
stores, per (segment, term) posting row, fixed-size blocks'
first-doc_ids and BM25 upper bounds (``indexer._make_encode_udf``:
``block_starts``, ``block_ubs`` with the tf-part
``tf*(k1+1)/(tf+k1*(1-b+b*len/avglen))``; multiplying by the per-term
constant ``qtf*idf`` gives a valid block score bound).

Exact top-k as ONE lazy DataFrame plan (a single Spark action unless
``return_stats``): per-term idf, seed selection, and the threshold θ
are broadcast subplans, never driver collects.

A. **seed**: exactly score the most promising segments (highest
   Σ-term upper bound); θ = the k-th best seed (score, doc_id).
B. **prune**: a block of term t survives iff
   ``w_t·block_ub + Σ_{t'≠t} max{w_t'·ub(b') : b' overlaps b} ≥ θ``
   — the classic block-max alignment: a doc in block b can only draw
   term t''s contribution from the t'-block whose doc range contains
   it, so the max over OVERLAPPING blocks (0 if none) bounds it.
   Docs appearing only in pruned blocks provably score < θ.
   Surviving blocks' doc_ids are recovered by decoding the
   delta+varint blob (vectorized numpy) and slicing the block's value
   range — candidates = union over surviving blocks (a superset of
   the true survivors, so exactness is preserved).
C. **rescore**: exact BM25 restricted to candidate docs, union with
   the seed top-k, global top-k with the canonical (-score, doc_id)
   tiebreak.

The pruning win at scale: phase B touches only (segment, term, block)
metadata rows (|postings|/block_size), and phase C's shuffle carries
only candidate docs instead of every posting entry. Prune
effectiveness depends on score skew: on a corpus where query terms
have near-uniform per-block upper bounds, every block can reach θ and
nothing prunes (correctly); skewed tf / doc-length distributions —
i.e., real text — are where the block bounds separate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import analyze_query
from ..functions.codec import delta_varint_decode
from .indexer import B, DEFAULT_BLOCK_SIZE, K1, InvertedIndex
from .query import bm25_scores, top_k_df


def _qtf(toks: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in toks:
        out[t] = out.get(t, 0) + 1
    return out


def bm25_topk_wand(
    index: InvertedIndex,
    terms: list[str],
    k: int,
    *,
    seed_segments: int = 1,
    block_size: int = DEFAULT_BLOCK_SIZE,
    return_stats: bool = False,
):
    """Exact BM25 top-k via block-max pruning. Returns the result
    DataFrame ``(doc_id, score)`` ordered by (-score, doc_id), or
    ``(df, stats)`` when ``return_stats`` — stats reports blocks
    pruned vs decoded for auditability/bench.
    """
    toks = analyze_query(terms, stem=index.stem)
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not toks:
        return (empty, {}) if return_stats else empty
    qtf = _qtf(toks)

    # The ENTIRE pruned top-k is ONE lazy plan (single Spark job when
    # return_stats is off): per-term idf, seed selection and the
    # threshold θ are subplans (broadcast 1-to-few-row DataFrames),
    # not driver collects — at any scale the only action is the final
    # top-k itself.
    n = float(index.n_docs)
    qdf = spark.createDataFrame(sorted(qtf.items()), "term string, qtf int")
    idf_col = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    # query terms absent from the corpus drop out here — the
    # reference's dictionary skip (IIM:617)
    wdf = F.broadcast(
        qdf.join(index.term_stats, "term").select(
            "term", (F.col("qtf") * idf_col).alias("w")
        )
    )

    p = index.postings.filter(F.col("term").isin(sorted(set(toks)))).select(
        "segment", "term", "doc_ids", "tfs", "blob", "block_starts", "block_ubs"
    )

    # per (segment, term) UB and per segment total UB (metadata-sized)
    seg_term_ub = (
        p.join(wdf, "term")
        .select(
            "segment", "term",
            (F.col("w") * F.array_max("block_ubs")).alias("t_ub"),
        )
    )
    seg_ub = seg_term_ub.groupBy("segment").agg(F.sum("t_ub").alias("seg_ub"))

    # seed segments (highest UB first, deterministic tiebreak) as a
    # broadcast subplan
    seeds_df = F.broadcast(
        seg_ub.orderBy(F.desc("seg_ub"), F.asc("segment"))
        .limit(seed_segments)
        .select("segment")
    )

    def _exact(scoped: DataFrame, cand: DataFrame | None = None) -> DataFrame:
        hits = scoped.select(
            "term", F.explode(F.arrays_zip("doc_ids", "tfs")).alias("_z")
        ).select(
            "term", F.col("_z.doc_ids").alias("doc_id"), F.col("_z.tfs").alias("tf")
        )
        if cand is not None:
            # restrict BEFORE the agg shuffle: only candidate docs move
            hits = hits.join(cand, "doc_id")
        denom = F.col("tf") + F.lit(K1) * (
            F.lit(1 - B) + F.lit(B) * F.col("doc_len") / F.lit(index.avg_len)
        )
        return (
            hits.join(wdf, "term")
            .join(index.doc_stats, "doc_id")
            .withColumn("_c", F.col("w") * F.col("tf") * F.lit(K1 + 1) / denom)
            .groupBy("doc_id")
            .agg(F.sum("_c").alias("score"))
        )

    # the k best seed-segment scores in canonical (-score, doc_id)
    # order. Docs live in exactly one segment, so a seed-segment doc
    # outside this top-k is dominated by k better (score, doc_id)
    # pairs and can never enter the global top-k — seed_topk therefore
    # REPLACES the full seed scoring in the final union. θ = the k-th
    # seed score (0 with fewer than k seeds), as a broadcast 1-row
    # aggregate rather than a driver collect.
    seed_topk = (
        _exact(p.join(seeds_df, "segment"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    theta_df = F.broadcast(
        seed_topk.agg(
            F.coalesce(
                F.when(F.count("*") >= k, F.min("score")), F.lit(0.0)
            ).alias("theta")
        )
    )

    # block metadata rows (the prune works on these only)
    blocks = p.select(
        "segment", "term",
        F.posexplode(F.arrays_zip("block_starts", "block_ubs")).alias("bi", "_z"),
    ).select(
        "segment", "term", "bi",
        F.col("_z.block_starts").alias("lo"),
        F.col("_z.block_ubs").alias("bub"),
    )
    # doc_id range per block: [lo, next block's lo - 1] (last block
    # extends to the segment end)
    wlead = Window.partitionBy("segment", "term").orderBy("bi")
    blocks = blocks.withColumn(
        "hi", F.coalesce(F.lead("lo").over(wlead) - 1, F.lit((1 << 62)))
    )
    # Per-block slack for the OTHER query terms: classic block-max
    # alignment — a doc in block b of term t can only draw term t''s
    # contribution from a t'-block whose doc range OVERLAPS b's, so the
    # bound per other term is the max UB over overlapping blocks (0
    # when none overlap: the doc has no t' posting at all). This is
    # dramatically tighter than the segment-level max for multi-term
    # queries, and still a valid upper bound. The overlap join runs on
    # block METADATA only (|postings|/block_size rows per term).
    wb = blocks.join(wdf, "term").select(
        "segment", "term", "bi", "lo", "hi", (F.col("w") * F.col("bub")).alias("wub")
    )
    a = wb.alias("a")
    o = wb.alias("b")
    pair_slack = (
        a.join(
            o,
            (F.col("a.segment") == F.col("b.segment"))
            & (F.col("a.term") != F.col("b.term"))
            & (F.col("b.lo") <= F.col("a.hi"))
            & (F.col("b.hi") >= F.col("a.lo")),
            "left",
        )
        .groupBy(
            F.col("a.segment").alias("segment"),
            F.col("a.term").alias("term"),
            F.col("a.bi").alias("bi"),
            F.col("a.wub").alias("wub"),
            F.col("b.term").alias("oterm"),
        )
        .agg(F.max(F.col("b.wub")).alias("o_max"))
        .groupBy("segment", "term", "bi", "wub")
        .agg(F.sum(F.coalesce("o_max", F.lit(0.0))).alias("others"))
    )
    surviving = (
        pair_slack.crossJoin(theta_df)
        .filter(F.col("wub") + F.col("others") >= F.col("theta"))
        .join(seeds_df, "segment", "left_anti")
        .groupBy("segment", "term")
        .agg(F.sort_array(F.collect_list("bi")).alias("bis"))
    )
    if return_stats:
        seeds = [r["segment"] for r in seeds_df.collect()]
        theta = float(theta_df.collect()[0]["theta"])
        n_blocks_total = blocks.join(seeds_df, "segment", "left_anti").count()
        n_blocks_kept = surviving.select(F.explode("bis")).count()

    # decode surviving blocks' doc_ids from the blob (value-range slice;
    # blocks are fixed-size value runs — indexer.DEFAULT_BLOCK_SIZE)
    rows = p.join(surviving, ["segment", "term"]).select(
        "segment", "term", "blob", "block_starts", "bis"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids = []
            for blob, starts, bis in zip(pdf["blob"], pdf["block_starts"], pdf["bis"]):
                ids = delta_varint_decode(bytes(blob))
                bs = block_size  # blocks are fixed value runs (codec.block_offsets)
                keep = np.concatenate(
                    [ids[b * bs:(b + 1) * bs] for b in bis]
                ) if len(bis) else np.empty(0, dtype=np.int64)
                out_ids.append(keep)
            yield pd.DataFrame({"doc_id": np.concatenate(out_ids) if out_ids else []})

    cand = rows.mapInPandas(_decode, "doc_id long").distinct()

    # Exact rescore of candidate docs. A candidate's segment has >=1
    # surviving block, so restricting to those segments is safe — but
    # within a segment ALL query-term posting rows must contribute
    # (a candidate found via term t1 still accrues t2's tf even if
    # every t2 block was pruned).
    surv_segs = surviving.select("segment").distinct()
    resc = _exact(p.join(surv_segs, "segment"), cand)
    # seed segments are excluded from surv_segs, and a doc lives in
    # exactly one segment — seed_topk and resc are disjoint, union only
    final = top_k_df(seed_topk.unionByName(resc), k)
    if return_stats:
        return final, {
            "theta": theta,
            "seed_segments": seeds,
            "blocks_total_nonseed": n_blocks_total,
            "blocks_decoded": n_blocks_kept,
            "prune_ratio": round(1 - n_blocks_kept / n_blocks_total, 4)
            if n_blocks_total
            else 0.0,
        }
    return final


def bm25_topk_exhaustive(index: InvertedIndex, terms: list[str], k: int) -> DataFrame:
    """Non-pruned baseline for equivalence tests and bench A/B."""
    return top_k_df(bm25_scores(index, terms), k)
