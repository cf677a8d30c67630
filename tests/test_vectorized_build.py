"""Regression tests for the vectorized build path added for scaling:

* ``tokenize_block`` (byte-level analyzer) parity with ``_analyze_py``
  on real testdata, edge cases, and random ASCII fuzz;
* ``delta_varint_encode_grouped`` byte-parity with the per-list codec;
* ``postings_from_aligned_corpus`` (zero-shuffle mapInArrow build)
  content-equality with the shuffled ``postings_from_corpus`` build.
"""

from __future__ import annotations

import random
import string

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.functions.analysis import (
    _analyze_py,
    tokenize_block,
)
from peterman_search_engine_spark.functions.codec import (
    delta_varint_encode,
    delta_varint_encode_grouped,
)


def _via_block(texts: list[str], stem: bool):
    arr = pa.array(texts, pa.string())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[: len(texts) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    tcodes, tinv, tdoc, pos, dlens = tokenize_block(data, offsets, stem=stem)
    out: list[list] = [[] for _ in texts]
    for c, d, p in zip(tinv, tdoc, pos):
        out[d].append((p, tcodes[c]))
    return [[t for _, t in sorted(l)] for l in out], list(dlens)


def _check(texts: list[str], stem: bool) -> None:
    got, dl = _via_block(texts, stem)
    want = [_analyze_py(t, stem) for t in texts]
    assert got == want
    assert dl == [len(w) for w in want]


@pytest.mark.parametrize("stem", [False, True])
def test_tokenize_block_edges(stem):
    _check(
        [
            "",
            "   ",
            "The the THE",
            "a,b;c?d!e.f",
            "hello",
            "..!?",
            "x" * 100,  # longer than the fixed-width cap
            "supercalifragilisticexpialidocious again",  # > 32 chars
            "The quick brown fox",
        ],
        stem,
    )


@pytest.mark.parametrize("stem", [False, True])
def test_tokenize_block_fuzz(stem):
    rng = random.Random(7)
    alphabet = string.ascii_letters + " ,.;?!\t\n" + string.digits
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
        for _ in range(300)
    ]
    _check(fuzz, stem)


def test_tokenize_block_non_ascii_raises():
    with pytest.raises(ValueError):
        _via_block(["héllo wörld"], False)


def test_short_batch_keeps_stopword_prefix_tokens():
    """A batch whose longest token is shorter than a stop word must NOT
    drop tokens equal to that stop word's prefix ('wit' is a real token
    even though 'with' is a stop word truncated to the 3-byte width)."""
    _check(["wit ha abo", "og is ok"], False)
    got, _ = _via_block(["wit ha abo"], False)
    assert got == [["wit", "ha", "abo"]]


def test_grouped_varint_parity():
    rng = np.random.default_rng(3)
    lists = [
        np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
        for n in (1, 2, 7, 128, 129, 1000)
    ]
    flat = np.concatenate(lists)
    starts = np.concatenate(([0], np.cumsum([len(l) for l in lists])[:-1]))
    buf, offs = delta_varint_encode_grouped(flat, starts)
    assert len(offs) == len(lists) + 1
    for i, l in enumerate(lists):
        assert buf[offs[i]: offs[i + 1]].tobytes() == delta_varint_encode(l)


def test_aligned_build_matches_shuffled(spark):
    from peterman_search_engine_spark.operators.indexer import (
        postings_from_aligned_corpus,
        postings_from_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    a = postings_from_corpus(
        docs, avg_len=20.0, stem=True, positional=True, docs_per_segment=100
    )
    b = postings_from_aligned_corpus(
        docs.repartitionByRange(6, "doc_id"),
        avg_len=20.0,
        stem=True,
        positional=True,
    )

    def canon(p):
        return {
            tuple(r)
            for r in p.select(
                "term",
                F.explode(F.arrays_zip("doc_ids", "tfs", "positions")).alias("z"),
            )
            .select(
                "term",
                F.col("z.doc_ids"),
                F.col("z.tfs"),
                F.col("z.positions").cast("array<int>").cast("string"),
            )
            .collect()
        }

    assert canon(a) == canon(b)


def test_non_ascii_corpus_fallback(spark):
    """Unicode text routes through the per-string analyzer fallback in
    BOTH build strategies; results must agree with the declarative
    JVM tokenizer path (which handles unicode natively)."""
    from peterman_search_engine_spark.operators.indexer import (
        postings_from_aligned_corpus,
        postings_from_corpus,
        postings_from_tokens_agg,
        tokenize_corpus,
    )

    rows = [
        (0, "héllo wörld héllo"),
        (1, "çedilla test naïve approach"),
        (2, "plain ascii text here"),
        (3, "日本語 テスト 日本語"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def canon(p):
        return {
            tuple(r)
            for r in p.select(
                "term",
                F.explode(F.arrays_zip("doc_ids", "tfs", "positions")).alias("z"),
            )
            .select(
                "term",
                F.col("z.doc_ids"),
                F.col("z.tfs"),
                F.col("z.positions").cast("array<int>").cast("string"),
            )
            .collect()
        }

    jvm = canon(
        postings_from_tokens_agg(
            tokenize_corpus(docs, stem=False), avg_len=4.0, docs_per_segment=2
        )
    )
    fused = canon(
        postings_from_corpus(
            docs, avg_len=4.0, stem=False, positional=True, docs_per_segment=2
        )
    )
    aligned = canon(
        postings_from_aligned_corpus(
            docs.repartitionByRange(3, "doc_id"),
            avg_len=4.0,
            stem=False,
            positional=True,
        )
    )
    assert jvm == fused == aligned
    assert any(t == "héllo" for t, *_ in jvm)


def test_assign_dense_doc_ids_no_duplicates_many_partitions(spark):
    """Regression (r3): the range partitioner samples split boundaries
    with an rdd-id-derived seed, so before the internal localCheckpoint
    the per-partition count bases could disagree with the partitioning
    a later evaluation produced — duplicate doc_ids on wide inputs.
    Trigger shape: a many-partition generated input with fine-grained
    keys, scanned twice."""
    from peterman_search_engine_spark.sources.adapters import (
        assign_dense_doc_ids,
    )
    from peterman_search_engine_spark.sources.transcripts import (
        generate_topical_transcripts,
    )

    n_conv, turns = 2_000, 10
    tr = generate_topical_transcripts(spark, n_conv, turns, num_partitions=16)
    ids = assign_dense_doc_ids(tr, ["conv_id", "turn_idx"])
    # scan 1: duplicate-free and dense
    agg = ids.groupBy("doc_id").count().agg(
        F.max("count").alias("m"),
        F.countDistinct("doc_id").alias("d"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    assert (agg["m"], agg["d"], agg["lo"], agg["hi"]) == (
        1, n_conv * turns, 0, n_conv * turns - 1,
    )
    # scan 2 (an INDEPENDENT evaluation): same assignment
    h1 = ids.select(
        F.sum(F.pmod(F.xxhash64("doc_id", "conv_id", "turn_idx"), F.lit(2**31 - 1))).alias("h")
    ).collect()[0]["h"]
    h2 = ids.select(
        F.sum(F.pmod(F.xxhash64("doc_id", "conv_id", "turn_idx"), F.lit(2**31 - 1))).alias("h")
    ).collect()[0]["h"]
    assert h1 == h2


def test_topical_generator_deterministic_across_partitioning(spark):
    from peterman_search_engine_spark.sources.transcripts import (
        generate_topical_transcripts,
    )

    def fp(df):
        return df.select(
            F.sum(
                F.pmod(
                    F.xxhash64("conv_id", "turn_idx", "role", "text", "tool", "ts"),
                    F.lit(2**31 - 1),
                )
            ).alias("h")
        ).collect()[0]["h"]

    a = generate_topical_transcripts(spark, 500, num_partitions=3)
    b = generate_topical_transcripts(spark, 500, num_partitions=11)
    assert a.count() == 5_000
    assert fp(a) == fp(b)
