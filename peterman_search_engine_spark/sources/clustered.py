"""Planted-cluster embedding fixture — the geometry where LSH/IVF ANN
actually shine.

The driver testdata's embeddings are near-isotropic, which is exactly
the regime where locality-sensitive bucketing provably cannot help
(documented in SCALE.md §8: single-bucket recall 0.0 there, theory-
consistent). This generator plants tight clusters so the OTHER half of
the story is demonstrable: a query drawn from a cluster finds its
neighbors inside one (or a few) buckets/cells at a small scanned
fraction.

Layout (all deterministic integer arithmetic — no RNG, reproducible
across engines and rounds):

* vec_id 0..C-1            — the C cluster CENTERS. IVF's deterministic
                             codebook is "the vectors with id < n_cells"
                             (similarity.ivf_cells), so with C == n_cells
                             the codebook IS the true centers — the
                             trained-quantizer best case.
* vec_id C..C+C*m-1        — cluster members: center + eps * delta,
                             cluster-major (member j of cluster c is
                             vec_id C + c*m + j).
* vec_id C+C*m..+n_noise   — background noise vectors, spread wide.

center(c)[i] = pmod(xxhash64('cc', c, i), 7)  - 3   in [-3, 3]
delta(g)[i]  = pmod(xxhash64('dd', g, i), 5)  - 2   in [-2, 2]
noise(n)[i]  = pmod(xxhash64('nn', n, i), 11) - 5   in [-5, 5]

(xxhash64 with Spark's fixed default seed — deterministic across runs
and rounds; a simple affine-mod pattern is NOT usable here: it is
periodic in the cluster id, so distinct clusters collide onto
identical centers). With eps small (default 0.05) members sit at
cosine ~0.999 to their center while inter-center cosines stay near 0
— the planted structure.

Everything is a pure Column expression over ``spark.range`` (transform
over a sequence literal): generation is embarrassingly parallel, no
Python UDF, no data movement — the same shape would generate 10^9
vectors on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash_component(tag: str, key, ii, mod: int, shift: int):
    return (
        F.pmod(F.xxhash64(F.lit(tag), key.cast("long"), ii.cast("long")), F.lit(mod))
        - shift
    ).cast("double")


def _center_expr(c, dim: int):
    i = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(i, lambda ii: _hash_component("cc", c, ii, 7, 3))


def _delta_expr(g, dim: int):
    i = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(i, lambda ii: _hash_component("dd", g, ii, 5, 2))


def _noise_expr(n, dim: int):
    i = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(i, lambda ii: _hash_component("nn", n, ii, 11, 5))


def clustered_embeddings(
    spark: SparkSession,
    *,
    n_clusters: int = 16,
    per_cluster: int = 64,
    n_noise: int = 1024,
    dim: int = 64,
    eps_e2: int = 5,
) -> DataFrame:
    """(vec_id long, embedding array<double>) with planted clusters.
    ``eps_e2`` is the member perturbation scale in hundredths (5 ->
    eps = 0.05). See module docstring for the id layout."""
    eps = eps_e2 / 100.0
    c_df = spark.range(n_clusters).select(
        F.col("id").alias("vec_id"), _center_expr(F.col("id"), dim).alias("embedding")
    )
    m_base = spark.range(n_clusters * per_cluster).select(
        (F.col("id") + n_clusters).alias("vec_id"),
        (F.col("id") / per_cluster).cast("long").alias("_c"),
        F.col("id").alias("_g"),
    )
    m_df = m_base.select(
        "vec_id",
        F.zip_with(
            _center_expr(F.col("_c"), dim),
            _delta_expr(F.col("_g"), dim),
            lambda cc, dd: cc + F.lit(eps) * dd,
        ).alias("embedding"),
    )
    n_df = spark.range(n_noise).select(
        (F.col("id") + n_clusters + n_clusters * per_cluster).alias("vec_id"),
        _noise_expr(F.col("id"), dim).alias("embedding"),
    )
    return c_df.unionByName(m_df).unionByName(n_df)


def cluster_of(vec_id: int, n_clusters: int = 16, per_cluster: int = 64) -> int | None:
    """The planted cluster of a vec_id (None for noise). Centers belong
    to their own cluster."""
    if vec_id < n_clusters:
        return vec_id
    m = vec_id - n_clusters
    if m < n_clusters * per_cluster:
        return m // per_cluster
    return None
