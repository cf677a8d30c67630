"""Round-4 ANN paths: persisted IVF (build-once cells, partition-pruned
probe), bucket-id-enumerated multi-probe LSH (and its persisted form),
and the planted-cluster fixture where LSH/IVF demonstrably win (the
missing half of SCALE.md §8's isotropic-failure story)."""

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators import similarity as SIM
from peterman_search_engine_spark.sources.clustered import (
    cluster_of,
    clustered_embeddings,
)

N_CLUSTERS = 16
PER_CLUSTER = 64
N_NOISE = 1024


@pytest.fixture(scope="module")
def emb(spark):
    return clustered_embeddings(
        spark,
        n_clusters=N_CLUSTERS,
        per_cluster=PER_CLUSTER,
        n_noise=N_NOISE,
    ).localCheckpoint(eager=True)


def _qv(emb, qid):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"]
    ]


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


# -- bucket enumeration -------------------------------------------------------

def test_enumerate_probe_buckets_counts_and_distance():
    got = SIM.enumerate_probe_buckets(0b1010, num_planes=8, radius=1)
    assert len(got) == 9  # C(8,0) + C(8,1)
    assert 0b1010 in got
    assert all(bin(b ^ 0b1010).count("1") <= 1 for b in got)
    got2 = SIM.enumerate_probe_buckets(5, num_planes=8, radius=2)
    assert len(got2) == 1 + 8 + 28
    assert len(set(got2)) == len(got2)
    # radius 0 is the single bucket
    assert SIM.enumerate_probe_buckets(7, num_planes=8, radius=0) == [7]


def test_enumerated_equals_hamming_filter(emb):
    """The IN-list plan and the bit_count scan filter are two
    renderings of the same probe set — identical results."""
    qid = N_CLUSTERS + 12 * PER_CLUSTER  # a cluster-12 member
    qv = _qv(emb, qid)
    for r in (0, 1, 2):
        a = _ids(
            SIM.lsh_multiprobe_topk(emb, qv, k=10, radius=r, exclude_ids=[qid])
        )
        b = _ids(
            SIM.lsh_multiprobe_enumerated_topk(
                emb, qv, k=10, radius=r, exclude_ids=[qid]
            )
        )
        assert a == b


# -- persisted structures -----------------------------------------------------

def test_ivf_persisted_matches_recompute(spark, emb, tmp_path):
    qid = N_CLUSTERS + 3 * PER_CLUSTER + 5
    qv = _qv(emb, qid)
    path = str(tmp_path / "ivf")
    SIM.build_ivf(emb, path, n_cells=16)
    live = _ids(
        SIM.ivf_topk(emb, qv, k=10, n_cells=16, n_probe=2, exclude_ids=[qid])
    )
    persisted = SIM.ivf_topk_persisted(
        spark, path, qv, k=10, n_probe=2, exclude_ids=[qid]
    )
    assert _ids(persisted) == live
    # the probe must be a partition-pruned scan of the cell dirs
    plan = persisted._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_ivf_topk_accepts_prebuilt_cells(spark, emb):
    qid = N_CLUSTERS + 3 * PER_CLUSTER + 5
    qv = _qv(emb, qid)
    cells = SIM.ivf_cells(emb, n_cells=16).localCheckpoint(eager=True)
    with_cells = _ids(
        SIM.ivf_topk(
            emb, qv, k=10, n_cells=16, n_probe=2, exclude_ids=[qid], cells=cells
        )
    )
    without = _ids(
        SIM.ivf_topk(emb, qv, k=10, n_cells=16, n_probe=2, exclude_ids=[qid])
    )
    assert with_cells == without


def test_lsh_persisted_matches_enumerated(spark, emb, tmp_path):
    qid = N_CLUSTERS + 7 * PER_CLUSTER + 1
    qv = _qv(emb, qid)
    path = str(tmp_path / "lsh")
    SIM.build_lsh(emb, path, dim=64)
    live = _ids(
        SIM.lsh_multiprobe_enumerated_topk(
            emb, qv, k=10, radius=1, exclude_ids=[qid]
        )
    )
    persisted = SIM.lsh_multiprobe_persisted(
        spark, path, qv, k=10, radius=1, exclude_ids=[qid]
    )
    assert _ids(persisted) == live
    plan = persisted._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


# -- planted clusters: the regime where bucketed ANN wins ---------------------

def test_clustered_fixture_recall(spark, emb):
    """On planted clusters the bucketed paths find the true neighbors
    at a small scanned fraction — the complement of the isotropic
    counter-example (SCALE.md §8). Asserts the measured r4 numbers
    hold with margin: single >= 0.8 mean, multiprobe r=1 and IVF p=1
    perfect, scanned fraction far below 1."""
    n = emb.count()
    withb = emb.withColumn(
        "_b", SIM.bucket_expr(F.col("embedding"), 64)
    ).localCheckpoint(eager=True)
    recalls = {"single": [], "multi": [], "ivf": []}
    fractions = []
    for c in (0, 7, 12):
        qid = N_CLUSTERS + c * PER_CLUSTER
        qv = _qv(emb, qid)
        exact = set(_ids(SIM.cosine_topk(emb, qv, k=10, exclude_ids=[qid])))
        # the exact neighbors ARE the planted cluster
        assert all(cluster_of(v, N_CLUSTERS, PER_CLUSTER) == c for v in exact)
        single = set(_ids(SIM.lsh_bucketed_topk(emb, qv, k=10, exclude_ids=[qid])))
        multi = set(
            _ids(
                SIM.lsh_multiprobe_enumerated_topk(
                    emb, qv, k=10, radius=1, exclude_ids=[qid]
                )
            )
        )
        ivf = set(
            _ids(SIM.ivf_topk(emb, qv, k=10, n_cells=16, n_probe=1, exclude_ids=[qid]))
        )
        recalls["single"].append(len(single & exact) / 10)
        recalls["multi"].append(len(multi & exact) / 10)
        recalls["ivf"].append(len(ivf & exact) / 10)
        qb = SIM.query_bucket(qv)
        fractions.append(withb.filter(F.col("_b") == qb).count() / n)
    assert sum(recalls["single"]) / 3 >= 0.8
    assert recalls["multi"] == [1.0, 1.0, 1.0]
    assert recalls["ivf"] == [1.0, 1.0, 1.0]
    assert max(fractions) < 0.2  # single-bucket scans a small slice
