"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force scan: one pass, no shuffle
  before the final TakeOrderedAndProject. The 100 TB baseline: a
  full-scan top-k is embarrassingly parallel and often the right
  answer for one-off queries.
* ``lsh_bucketed_topk`` — the scale path for repeated queries:
  random-hyperplane LSH signatures (deterministic integer planes so
  engine and SQL oracle agree bit-for-bit) bucket the corpus; a query
  probes only its own bucket. Bucket assignment is a pure projection
  (no shuffle); the probe prunes the scan to ~1/2^P of the data.

Dot products/norms use ``zip_with`` + ``aggregate`` — JVM higher-order
functions, no UDF, vectorized by codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.
    Returns (vec_id, cos double) ordered by (-cos, vec_id)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    df = embeddings
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin(exclude_ids))
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            cosine(F.col(vec_col), q).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def plane_component(p: int, i: int) -> int:
    """Deterministic integer hyperplane component in {-2..2}: plane p,
    dimension i. Shared with the SQL oracle — both engines compute the
    identical planes with integer arithmetic (no RNG, no floats)."""
    return ((p * 37 + i * 11) % 5) - 2


def _bucket_expr(vec_col: Column, dim: int, num_planes: int) -> Column:
    bucket = F.lit(0)
    for p in range(num_planes):
        plane = F.array(
            *[F.lit(float(plane_component(p, i))) for i in range(dim)]
        )
        # sign test on the e6-rounded dot so the SQL oracle (whose SUM
        # order differs at ~1e-15) lands on the identical bucket
        bucket = bucket + F.when(
            F.round(_dot(vec_col, plane) * 1_000_000) > 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
    return bucket


def lsh_buckets(
    embeddings: DataFrame,
    *,
    dim: int,
    num_planes: int = NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket int): random-hyperplane signature. At scale this
    is the partition/cluster key — write the table bucketed by it and
    probes become single-partition scans."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        _bucket_expr(F.col(vec_col), dim, num_planes).alias("bucket"),
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    *,
    dim: int,
    threshold_e6: int = 300_000,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: the fifth dedup
    modality (after exact / MinHash-LSH / SimHash / n-gram Jaccard).

    Scale path: random-hyperplane LSH buckets (fewer planes than ANN —
    recall over precision for dedup) restrict the self-join to
    same-bucket pairs, keeping the candidate set ~|n|²/2^P instead of
    the full cross join; exact cosine then verifies each candidate.
    At 100 TB the bucket column is the repartition key, so the
    self-join is per-bucket-local. Returns (vec_a, vec_b, cos_e6) for
    candidate pairs with round(cos*1e6) >= threshold_e6, vec_a < vec_b.
    """
    # bucket rows CARRY their vector and its precomputed norm, so the
    # same-bucket self-join directly yields everything the exact
    # cosine needs: no join back to the embeddings table (at scale:
    # one bucket-keyed shuffle instead of three), norms computed once
    # per VECTOR instead of twice per PAIR, and only the pair dot
    # product is evaluated per candidate. Repartition spreads the
    # pair generation across tasks (a small parquet would otherwise
    # run the whole quadratic-per-bucket join in one task).
    nparts = embeddings.sparkSession.sparkContext.defaultParallelism
    buckets = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        _bucket_expr(F.col(vec_col), dim, num_planes).alias("bucket"),
    ).repartition(nparts, "vec_id")
    a = buckets.alias("a")
    b = buckets.alias("b")
    scored = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            _dot(F.col("a.vec"), F.col("b.vec"))
            / (F.col("a.nrm") * F.col("b.nrm"))
            * 1_000_000
        )
        .cast("long")
        .alias("cos_e6"),
    )
    return scored.filter(F.col("cos_e6") >= threshold_e6).select(
        "vec_a", "vec_b", "cos_e6"
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    num_planes: int = NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """ANN: restrict the exact scan to the query's LSH bucket.
    Returns (vec_id, cos double) ordered by (-cos, vec_id)."""
    dim = len(query_vec)
    qbucket = 0
    for p in range(num_planes):
        dot = sum(plane_component(p, i) * float(v) for i, v in enumerate(query_vec))
        if round(dot * 1_000_000) > 0:
            qbucket |= 1 << p
    with_b = embeddings.withColumn(
        "_bucket", _bucket_expr(F.col(vec_col), dim, num_planes)
    ).filter(F.col("_bucket") == qbucket)
    return cosine_topk(
        with_b, query_vec, k=k, id_col=id_col, vec_col=vec_col, exclude_ids=exclude_ids
    )
