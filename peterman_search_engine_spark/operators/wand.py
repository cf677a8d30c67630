"""Block-max WAND top-k pruning (north-star addition).

No reference counterpart — the closest analogue is the per-segment
dictionary skip (``InvertedIndexManager.java:390, 617``). The index
stores, per (segment, term) posting row, fixed-size blocks'
first-doc_ids and BM25 upper bounds (``indexer._make_encode_udf``:
``block_starts``, ``block_ubs`` with the tf-part
``tf*(k1+1)/(tf+k1*(1-b+b*len/avglen))``; multiplying by the per-term
constant ``qtf*idf`` gives a valid block score bound).

Exact top-k in three phases, all DataFrame-plan except tiny collects
(per-query-term idf dict, seed segment ids, the threshold scalar):

A. **seed**: score the most promising segments (highest Σ-term upper
   bound) exactly; the k-th seed score is the threshold θ.
B. **prune**: a block survives iff
   ``qtf_t·idf_t·block_ub + Σ_{t'≠t} seg_term_ub(t') ≥ θ``.
   Docs appearing ONLY in pruned blocks provably score < θ and are
   dropped. Surviving blocks' doc_ids are recovered by decoding the
   delta+varint blob (vectorized numpy) and slicing the block's value
   range — candidates = union over surviving blocks (a superset of
   the true survivors, so exactness is preserved).
C. **rescore**: exact BM25 restricted to candidate docs, union with
   the seed scores, global top-k with the canonical
   (-score, doc_id) tiebreak.

The pruning win at scale: phase B touches only (segment, term, block)
metadata rows (|postings|/block_size), and phase C's shuffle carries
only candidate docs instead of every posting entry.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

    # tiny collect 1: per-term idf (|query terms| rows)
    st = index.term_stats.filter(F.col("term").isin(list(qtf))).collect()
    n = float(index.n_docs)
    idf = {
        r["term"]: float(np.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)))
        for r in st
    }
    if not idf:
        return (empty, {}) if return_stats else empty
    wmap = {t: qtf[t] * idf[t] for t in idf}  # per-term constant weight
    wdf = F.broadcast(
        spark.createDataFrame(
            [(t, w) for t, w in sorted(wmap.items())], "term string, w double"
        )
    )

    p = index.postings.filter(F.col("term").isin(list(idf))).select(
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

    # tiny collect 2: seed segment ids (highest UB first)
    seeds = [
        r["segment"]
        for r in seg_ub.orderBy(F.desc("seg_ub")).limit(seed_segments).collect()
    ]

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

    # tiny collect 3: the k best seed-segment scores (canonical
    # (-score, doc_id) order so tie selection matches the final
    # tiebreak); θ = the k-th. Docs live in exactly one segment, so a
    # seed-segment doc outside this top-k is dominated by k better
    # (score, doc_id) pairs and can never enter the global top-k —
    # the collected rows therefore REPLACE the seed DataFrame in the
    # final union (no recompute of seed scoring).
    kth = (
        _exact(p.filter(F.col("segment").isin(seeds)))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    theta = float(kth[-1]["score"]) if len(kth) >= k else 0.0
    seed_topk = spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in kth],
        "doc_id long, score double",
    )

    # block metadata rows + the "other terms at their segment max" slack
    blocks = p.select(
        "segment", "term",
        F.posexplode(F.arrays_zip("block_starts", "block_ubs")).alias("bi", "_z"),
    ).select(
        "segment", "term", "bi", F.col("_z.block_ubs").alias("bub")
    )
    other = (
        seg_term_ub.join(seg_ub, "segment")
        .select("segment", "term", (F.col("seg_ub") - F.col("t_ub")).alias("others"))
    )
    surviving = (
        blocks.join(wdf, "term")
        .join(other, ["segment", "term"])
        .filter(F.col("w") * F.col("bub") + F.col("others") >= F.lit(theta))
        .filter(~F.col("segment").isin(seeds))
        .groupBy("segment", "term")
        .agg(F.sort_array(F.collect_list("bi")).alias("bis"))
    )
    if return_stats:
        n_blocks_total = blocks.filter(~F.col("segment").isin(seeds)).count()
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
