"""Storage seam (plans.storage.TableStore): Iceberg when the runtime
jar is present, parquet+manifest fallback otherwise. The sandbox ships
without the Iceberg jar, so the iceberg-mode test self-skips there —
the seam itself (mode probe, uniform surface, per-partition commits)
is exercised in both cases.
"""

import pytest

from peterman_search_engine_spark.plans.storage import TableStore, iceberg_available


def test_mode_probe_matches_classpath(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "w"))
    expected = "iceberg" if iceberg_available(spark) else "parquet"
    assert store.mode == expected


def test_iceberg_mode_refused_without_jar(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("iceberg jar present — refusal path not applicable")
    with pytest.raises(RuntimeError):
        TableStore(spark, str(tmp_path / "w"), mode="iceberg")


def _roundtrip(store, spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    store.write(df, "t1")
    assert store.exists("t1")
    assert sorted(r["v"] for r in store.read("t1").collect()) == ["a", "b", "c"]

    # per-partition idempotent commit: rewriting one partition must not
    # touch the other and must be replay-safe
    p0 = spark.createDataFrame([(10, "x")], "id long, v string")
    p1 = spark.createDataFrame([(20, "y")], "id long, v string")
    store.write_partition(p0, "t2", "group", 0)
    store.write_partition(p1, "t2", "group", 1)
    store.write_partition(p0, "t2", "group", 0)  # replay
    rows = store.read("t2").collect()
    assert sorted((r["group"], r["v"]) for r in rows) == [(0, "x"), (1, "y")]


def test_parquet_mode_roundtrip(spark, tmp_path):
    _roundtrip(TableStore(spark, str(tmp_path / "pq"), mode="parquet"), spark)


def test_iceberg_mode_roundtrip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg runtime jar not on classpath (sandbox ships parquet mode)")
    _roundtrip(TableStore(spark, str(tmp_path / "wh"), mode="iceberg"), spark)


def test_checkpoint_build_through_store(spark, tiny_corpus, tmp_path):
    """build_index_checkpointed + load_index route through the seam and
    stay resumable (manifest skip) in the shipped mode."""
    from peterman_search_engine_spark.operators import query as Q
    from peterman_search_engine_spark.plans.checkpoint import (
        build_index_checkpointed,
        load_index,
    )

    d = str(tmp_path / "idx")
    rep1 = build_index_checkpointed(
        tiny_corpus, d, stem=False, positional=True,
        docs_per_segment=40, segments_per_group=2,
    )
    assert rep1["groups_built"] > 0
    rep2 = build_index_checkpointed(
        tiny_corpus, d, stem=False, positional=True,
        docs_per_segment=40, segments_per_group=2,
    )
    assert rep2["groups_built"] == 0
    assert rep2["groups_skipped"] == rep1["groups_total"]
    idx = load_index(spark, d)
    assert Q.search_bm25(idx, ["spark"], 5).count() > 0
