"""Training-data curation operators: deterministic stratified
sampling and benchmark decontamination.

Both are standard steps of an LLM training-data pipeline that sit
DOWNSTREAM of dedup (operators/dedup.py) and quality scoring
(functions/textstats.py); neither exists in the reference (a pure
search engine) — they belong to the "operations a large-scale
training-data pipeline would need" axis.

Scale posture:

* sampling is a pure filter expression (zero shuffle, full codegen,
  pushes nothing but reads only the columns it needs) keyed on a
  DETERMINISTIC per-row hash — reruns and resumed jobs keep the exact
  same sample, unlike rand()-based sampling whose output changes with
  partitioning and retries;
* decontamination is one shingle equi-join against the benchmark
  shingle set + one groupBy — at 100 TB the benchmark side is tiny
  (evals are ~10^6 n-grams) and broadcasts; the corpus side streams
  through map-side partial counts. No all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import md5_long
from .dedup import shingle_df

SAMPLE_RES = 1_000_000


def sample_hash(doc_id: Column, salt: str) -> Column:
    """Uniform deterministic bucket in [0, 1e6) — portable between
    Spark and DuckDB (md5-derived, like every other hash here)."""
    return F.pmod(
        md5_long(F.concat(F.lit(salt + ":"), doc_id.cast("string"))),
        F.lit(SAMPLE_RES),
    )


def sample_stratified(
    corpus: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
    salt: str = "pse-sample",
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]``
    (``default_rate`` for unlisted strata), deterministically: a row
    is kept iff hash(doc_id) < rate — so a doc's fate never depends
    on partitioning, task retries, or row order, and DOWN-sampling a
    stratum later (smaller rate) keeps a strict subset of the earlier
    sample (nested samples, the property curation pipelines rely on
    when re-mixing sources).
    """
    rate = None
    for s, r in sorted(rates.items()):
        c = F.when(F.col(strata_col) == s, F.lit(int(r * SAMPLE_RES)))
        rate = c if rate is None else rate.when(
            F.col(strata_col) == s, F.lit(int(r * SAMPLE_RES))
        )
    rate = (
        rate.otherwise(F.lit(int(default_rate * SAMPLE_RES)))
        if rate is not None
        else F.lit(int(default_rate * SAMPLE_RES))
    )
    return corpus.filter(sample_hash(F.col("doc_id"), salt) < rate)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    min_overlap: int = 2,
) -> DataFrame:
    """Flag corpus docs whose 3-token shingle set overlaps the
    BENCHMARK shingle set (union over all benchmark docs) in at least
    ``min_overlap`` distinct shingles — the n-gram-collision
    decontamination used to scrub eval contamination from training
    sets. Returns one row per corpus doc:
    ``(doc_id, n_shingles, n_overlap, contaminated)``.

    The benchmark's distinct shingle set is the join's build side
    (broadcastable at real scale); overlap counting is a map-side
    partial-aggregated groupBy on doc_id.
    """
    corpus_sh = shingle_df(corpus)
    bench_sh = shingle_df(benchmark).select("shingle").distinct()
    overlap = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    sizes = corpus_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (
        corpus.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def curation_pipeline(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    quality_min_e6: int = 500_000,
    min_overlap: int = 2,
    salt: str = "pse-sample",
) -> DataFrame:
    """The whole curation pass as ONE declarative plan — the chain a
    training-data pipeline runs over every raw dump:

        exact dedup  ->  quality floor  ->  decontamination  ->  sample

    * dedup: keep the min-doc_id representative of each exact text
      group (hash groupBy on md5(text) — one shuffle of (hash, id)
      pairs, never text);
    * quality: ROUND(quality_score*1e6) >= quality_min_e6 — the
      threshold compares rounded integers so survivorship is
      engine-exact, not float-boundary-dependent;
    * decontamination: shingle overlap vs the benchmark set computed
      ONLY for docs still alive (the broadcast-join cost scales with
      survivors, and a doc's overlap count is doc-local so late
      filtering changes nothing);
    * sampling: the deterministic per-row hash filter.

    Catalyst fuses the three per-doc predicates into the scan behind
    ONE pass over text; the only shuffles are the dedup groupBy and
    the decontamination overlap count. Requires ``corpus`` columns
    (doc_id, text, ``strata_col``). Returns (doc_id, ``strata_col``)
    survivors.
    """
    from ..functions.textstats import quality_score

    keep = (
        corpus.select(F.md5("text").alias("_h"), "doc_id")
        .groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    qual_ok = (
        F.round(quality_score(F.col("text")) * 1_000_000).cast("long")
        >= F.lit(int(quality_min_e6))
    )
    alive = corpus.join(keep, "doc_id", "left_semi").filter(qual_ok)
    flags = decontaminate(alive, benchmark, min_overlap=min_overlap)
    clean = alive.join(
        flags.filter(~F.col("contaminated")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return sample_stratified(
        clean, strata_col, rates, default_rate=default_rate, salt=salt
    ).select("doc_id", strata_col)
