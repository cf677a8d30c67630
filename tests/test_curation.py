"""Curation operators: deterministic stratified sampling and
benchmark decontamination (operators/curation.py)."""

from pyspark.sql import functions as F

from peterman_search_engine_spark.operators.curation import (
    decontaminate,
    sample_stratified,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )


def test_sampling_is_deterministic_and_stratified(spark):
    docs = _docs(spark)
    out1 = {r["doc_id"] for r in sample_stratified(docs, "src", {"a": 0.3}).collect()}
    out2 = {r["doc_id"] for r in sample_stratified(docs, "src", {"a": 0.3}).collect()}
    assert out1 == out2  # rerun-identical
    # stratum b has default_rate=1.0: all 200 odd ids survive
    assert {i for i in out1 if i % 2 == 1} == {i for i in range(400) if i % 2 == 1}
    # stratum a is downsampled: strictly between 0 and all
    a_kept = {i for i in out1 if i % 2 == 0}
    assert 0 < len(a_kept) < 200


def test_sampling_is_nested_across_rates(spark):
    docs = _docs(spark)
    k50 = {r["doc_id"] for r in sample_stratified(docs, "src", {"a": 0.5, "b": 0.5}).collect()}
    k20 = {r["doc_id"] for r in sample_stratified(docs, "src", {"a": 0.2, "b": 0.2}).collect()}
    assert k20 <= k50  # smaller rate keeps a strict subset


def test_decontaminate_flags_benchmark_overlap(spark):
    # corpus doc 100 copies benchmark doc text verbatim; doc 101 shares
    # nothing (distinct vocabulary, no common 3-shingle)
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (100, "alpha beta gamma delta epsilon zeta"),
        (101, "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6 zzq7"),
        # shares exactly 2 shingles with the benchmark:
        # "beta gamma delta" and "gamma delta epsilon"
        (102, "beta gamma delta epsilon qqx1 qqx2 qqx3"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = corpus.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, min_overlap=2).collect()}
    assert out[100]["contaminated"] and out[100]["n_overlap"] == out[100]["n_shingles"]
    assert not out[101]["contaminated"] and out[101]["n_overlap"] == 0
    # doc 102 shares exactly 2 shingles ("beta gamma delta" window)
    assert out[102]["n_overlap"] == 2 and out[102]["contaminated"]
    assert out[0]["contaminated"]  # benchmark doc itself collides fully
