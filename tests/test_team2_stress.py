"""Bulk-scale exact-hit-count stress analogue of the reference's
``Team2StressTest.java:52-59,90,106``: 1500 copies of one large
document containing "elizabeth", plus "qwertyuiop elizabeth" and
"qwertyuiop" — keyword("elizabeth") must hit EXACTLY 1501 docs and
AND("qwertyuiop", "elizabeth") exactly 1, after a multi-segment build
AND after merging segments.

The reference streams Pride and Prejudice from a course URL; this
sandbox has no network, so the large document is a deterministic
~2000-token synthetic with the same relevant structure (the probe
words embedded once in a large repeated body). Marked slow: ~3M
tokens through the full Arrow build path.
"""

import random

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import (
    build_index,
    merge_segments,
)

N_COPIES = 1500
DOC_TOKENS = 2000


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def stress_index(spark):
    rng = random.Random(221)
    vocab = [f"novelword{i}" for i in range(5000)]
    body = " ".join(rng.choice(vocab) for _ in range(DOC_TOKENS - 3))
    big_doc = f"chapter one elizabeth {body}"
    big = spark.range(N_COPIES).select(
        F.col("id").alias("doc_id"), F.lit(big_doc).alias("text")
    )
    small = spark.createDataFrame(
        [
            (N_COPIES, "qwertyuiop elizabeth"),
            (N_COPIES + 1, "qwertyuiop"),
        ],
        "doc_id long, text string",
    )
    corpus = big.unionByName(small)
    # small docs_per_segment -> many segments, exercising the same
    # multi-flush layout the reference's flush threshold forces
    return build_index(
        corpus, stem=False, positional=False, docs_per_segment=200
    )


def test_keyword_hit_count_after_build(stress_index):
    assert Q.search_keyword(stress_index, "elizabeth").count() == N_COPIES + 1
    assert Q.search_keyword(stress_index, "qwertyuiop").count() == 2


def test_and_hit_count_after_build(stress_index):
    hits = Q.search_and(stress_index, ["qwertyuiop", "elizabeth"]).collect()
    assert [r.doc_id for r in hits] == [N_COPIES]


def test_counts_survive_merge(stress_index):
    n_before = stress_index.num_segments()
    merged = merge_segments(stress_index, factor=4)
    assert merged.num_segments() < n_before
    assert Q.search_keyword(merged, "elizabeth").count() == N_COPIES + 1
    and_hits = Q.search_and(merged, ["qwertyuiop", "elizabeth"]).collect()
    assert [r.doc_id for r in and_hits] == [N_COPIES]
