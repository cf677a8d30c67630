"""Connected-components clustering (operators/dedup.py).

Shapes chosen to break naive implementations:

* a LONG CHAIN — diameter = n, where plain min-label propagation needs
  n rounds; large-star/small-star must converge within the O(log^2 n)
  round budget;
* multiple components with interleaved ids (labels must not leak
  across components);
* duplicate / reversed / self-loop input pairs (the operator must
  normalize);
* singletons via dedup_clusters (docs in no pair map to themselves).
"""

import itertools

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
)


def _labels(df):
    return {
        r["doc_id"]: r["cluster_id"] for r in df.collect()
    }


def test_cc_long_chain_converges_in_log_rounds(spark):
    # path 0-1-2-...-99: one component, min label 0. max_rounds=16
    # would time out a diameter-bound propagation (needs ~99 rounds).
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components(pairs))
    assert got == {i: 0 for i in range(100)}


def test_cc_multiple_components_interleaved_ids(spark):
    # component A = evens {0,2,4,6}, component B = odds {1,3,5}
    pairs = spark.createDataFrame(
        [(0, 2), (4, 2), (6, 4), (3, 1), (5, 3)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components(pairs))
    assert got == {0: 0, 2: 0, 4: 0, 6: 0, 1: 1, 3: 1, 5: 1}


def test_cc_messy_input_pairs(spark):
    # duplicates, both orientations, self loops
    pairs = spark.createDataFrame(
        [(7, 3), (3, 7), (7, 3), (5, 5), (3, 9)], "doc_a long, doc_b long"
    )
    got = _labels(connected_components(pairs))
    # 5 only appears as a self loop -> no edge -> absent from the
    # pair-graph result (dedup_clusters restores singletons)
    assert got == {3: 3, 7: 3, 9: 3}


def test_cc_star_and_clique(spark):
    star = [(50, x) for x in range(51, 60)]
    clique = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = spark.createDataFrame(star + clique, "doc_a long, doc_b long")
    got = _labels(connected_components(pairs))
    assert {k: v for k, v in got.items() if k >= 50} == {
        x: 50 for x in range(50, 60)
    }
    assert {k: v for k, v in got.items() if k < 50} == {
        x: 10 for x in range(10, 14)
    }


def _banded_pairs_py(sigs, num_hashes, rows_per_band):
    """Pure-Python oracle: pairs agreeing on every row of >=1 band."""
    nbands = num_hashes // rows_per_band
    expect = set()
    for (da, sa), (db, sb) in itertools.combinations(sorted(sigs.items()), 2):
        for b in range(nbands):
            lo = b * rows_per_band
            if sa[lo : lo + rows_per_band] == sb[lo : lo + rows_per_band]:
                expect.add((da, db))
                break
    return expect


@pytest.mark.parametrize("rows_per_band", [1, 2])
def test_lsh_banding_matches_python_oracle(spark, tiny_corpus, rows_per_band):
    num_hashes = 4
    sigs = {
        r["doc_id"]: tuple(r[f"mh_{k}"] for k in range(num_hashes))
        for r in minhash_signatures(tiny_corpus, num_hashes=num_hashes).collect()
    }
    expect = _banded_pairs_py(sigs, num_hashes, rows_per_band)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            tiny_corpus, num_hashes=num_hashes, rows_per_band=rows_per_band
        ).collect()
    }
    assert got == expect
    if rows_per_band > 1:
        # r>1 only suppresses candidates relative to r=1 (precision knob)
        r1 = _banded_pairs_py(sigs, num_hashes, 1)
        assert got <= r1


def test_lsh_banding_rejects_uneven_split(tiny_corpus):
    with pytest.raises(ValueError):
        lsh_candidate_pairs(tiny_corpus, num_hashes=4, rows_per_band=3)


@pytest.mark.parametrize("num_hashes", [4])
def test_dedup_clusters_covers_every_doc(spark, tiny_corpus, num_hashes):
    out = dedup_clusters(tiny_corpus, num_hashes=num_hashes)
    n = tiny_corpus.count()
    assert out.count() == n  # one row per doc, singletons included
    # cluster_id is a member of its own cluster and the minimum of it
    bad = (
        out.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("mn"))
        .filter(F.col("cluster_id") != F.col("mn"))
        .count()
    )
    assert bad == 0
