"""Deletion-neighborhood dictionary index (operators/spell.py): the
indexed fuzzy/spell operators must be result-identical to the
full-dictionary-scan forms (query.search_fuzzy / suggest_spelling),
the JVM variant generator must mirror the driver-side one exactly,
and the persisted form must partition-prune."""

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators import spell as SP
from peterman_search_engine_spark.operators.indexer import build_index


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "vector search engine"),
        (1, "victor posts a letter"),
        (2, "the vectors align"),
        (3, "sector seven is sealed"),
        (4, "a verse about vectors"),
        (5, "vector vector vector"),
        (6, "select the sector"),
        (7, "detector of typos"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, stem=False, positional=True, docs_per_segment=3)


@pytest.fixture(scope="module")
def spell2(index):
    return SP.build_spell_index(index, max_dist=2)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _rows(df):
    return [(r["term"], r["df"], r["dist"]) for r in df.collect()]


def test_variant_expr_mirrors_python(spark):
    words = ["vector", "a", "ab", "sector", "xyzzy", "detector"]
    for d in (1, 2):
        got = {
            r["w"]: sorted(r["v"])
            for r in spark.createDataFrame([(w,) for w in words], "w string")
            .select("w", SP.deletion_variants_expr(F.col("w"), d).alias("v"))
            .collect()
        }
        for w in words:
            assert got[w] == SP.query_deletion_variants(w, d), (w, d)


def test_bucket_expr_mirrors_python(spark):
    vs = ["vector", "vctor", "ector", "x", ""]
    rows = (
        spark.createDataFrame([(v,) for v in vs], "v string")
        .select("v", SP._bucket_expr(F.col("v"), 64).alias("b"))
        .collect()
    )
    for r in rows:
        assert r["b"] == SP._py_bucket(r["v"], 64), r["v"]


def test_suggest_indexed_equals_full_scan(index, spell2):
    for term, d in (("vectr", 2), ("sparc", 2), ("vektor", 2), ("vectr", 1)):
        want = _rows(Q.suggest_spelling(index, term, max_dist=d, top_k=5))
        got = _rows(
            SP.suggest_spelling_indexed(spell2, term, max_dist=d, top_k=5)
        )
        assert got == want, (term, d)


def test_fuzzy_indexed_equals_full_scan(index, spell2):
    for term, d in (("vectr", 1), ("vector", 1), ("sectr", 2), ("qqq", 1)):
        want = _ids(Q.search_fuzzy(index, term, d))
        got = _ids(SP.search_fuzzy_indexed(index, spell2, term, d))
        assert got == want, (term, d)


def test_indexed_rejects_wider_distance_than_built(index):
    sp1 = SP.build_spell_index(index, max_dist=1)
    with pytest.raises(ValueError):
        SP.suggest_spelling_indexed(sp1, "vectr", max_dist=2)
    with pytest.raises(ValueError):
        SP.search_fuzzy_indexed(index, sp1, "vectr", 2)


def test_persisted_spell_prunes_partitions(index, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spellidx"))
    sp = SP.build_spell_index(index, max_dist=2, out_dir=d)
    assert sp.n_buckets == SP.DEFAULT_SPELL_BUCKETS
    got = SP.suggest_spelling_indexed(sp, "vectr", max_dist=2, top_k=5)
    want = _rows(Q.suggest_spelling(index, "vectr", max_dist=2, top_k=5))
    assert _rows(got) == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # and the variant IN-filter reaches the scan too
    assert "PushedFilters" in plan


def test_fuzzy_indexed_overflow_falls_back_distributed(index, spell2):
    # cap of 0 forces the distributed posting-predicate branch; results
    # must not change
    want = _ids(Q.search_fuzzy(index, "vectr", 1))
    got = _ids(
        SP.search_fuzzy_indexed(index, spell2, "vectr", 1, max_expansions=0)
    )
    assert got == want
