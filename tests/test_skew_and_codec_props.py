"""Skew-boundedness and codec property tests.

North-rule skew requirement: a stop-word-grade hot term (present in
~every turn) must never concentrate on one reducer. The design bound:
posting rows are per (segment, term) with segment = a doc_id range of
at most ``docs_per_segment`` docs, so ANY term's largest posting list
is capped at docs_per_segment entries regardless of its global
frequency — the segment id is a built-in salt.

Codec: hypothesis roundtrip over arbitrary sorted non-negative int64
lists (delta+varint encode/decode are inverses; grouped encode agrees
with per-list encode byte-for-byte).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from peterman_search_engine_spark.functions.codec import (
    delta_varint_decode,
    delta_varint_encode,
    delta_varint_encode_grouped,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_codec_roundtrip_property(vals):
    vals = sorted(vals)
    blob = delta_varint_encode(np.array(vals, dtype=np.int64))
    assert list(delta_varint_decode(blob)) == vals


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**32), min_size=1, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_grouped_encode_matches_per_list_property(lists):
    lists = [sorted(l) for l in lists]
    flat = np.concatenate([np.array(l, dtype=np.int64) for l in lists])
    starts = np.concatenate(
        ([0], np.cumsum([len(l) for l in lists])[:-1])
    ).astype(np.int64)
    buf, offs = delta_varint_encode_grouped(flat, starts)
    for i, l in enumerate(lists):
        assert (
            buf[offs[i]: offs[i + 1]].tobytes()
            == delta_varint_encode(np.array(l, dtype=np.int64))
        )


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**32), min_size=0, max_size=10),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_grouped_encode_allows_empty_groups_property(lists):
    """Empty groups — leading, interior, trailing — yield zero-length
    byte slices and never disturb their neighbours (ADVICE r2: trailing
    empty groups used to IndexError, leading ones wrapped offsets)."""
    lists = [sorted(l) for l in lists]
    flat = (
        np.concatenate([np.array(l, dtype=np.int64) for l in lists if l])
        if any(lists)
        else np.empty(0, dtype=np.int64)
    )
    starts = np.concatenate(
        ([0], np.cumsum([len(l) for l in lists])[:-1])
    ).astype(np.int64)
    buf, offs = delta_varint_encode_grouped(flat, starts)
    assert len(offs) == len(lists) + 1
    for i, l in enumerate(lists):
        assert (
            buf[offs[i]: offs[i + 1]].tobytes()
            == delta_varint_encode(np.array(l, dtype=np.int64))
        )


def test_grouped_encode_empty_group_edges():
    # trailing empty group: starts contains vals.size
    buf, offs = delta_varint_encode_grouped(
        np.array([5, 9], dtype=np.int64), np.array([0, 2], dtype=np.int64)
    )
    assert list(offs) == [0, len(buf), len(buf)]
    assert list(delta_varint_decode(buf.tobytes())) == [5, 9]
    # leading empty group: its slice is empty, not the whole buffer
    buf, offs = delta_varint_encode_grouped(
        np.array([5, 9], dtype=np.int64), np.array([0, 0], dtype=np.int64)
    )
    assert offs[1] - offs[0] == 0
    assert buf[offs[1]: offs[2]].tobytes() == delta_varint_encode(
        np.array([5, 9], dtype=np.int64)
    )


def test_hot_term_posting_rows_are_bounded(spark):
    """A term occurring in EVERY doc still yields posting rows of at
    most docs_per_segment entries each — the skew cap the 10^12-turn
    design relies on (no single reducer ever sees a full global
    posting list)."""
    from peterman_search_engine_spark.operators.indexer import build_index

    dps = 50
    n = 600
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # 'hotterm' in every doc + a per-doc unique token
        F.concat(F.lit("hotterm filler"), F.col("id").cast("string")).alias("text"),
    )
    idx = build_index(docs, stem=False, positional=False, docs_per_segment=dps)
    rows = (
        idx.postings.filter(F.col("term") == "hotterm")
        .select("segment", F.size("doc_ids").alias("n"))
        .collect()
    )
    assert len(rows) == n // dps  # one bounded row per segment
    assert all(r["n"] <= dps for r in rows)
    assert sum(r["n"] for r in rows) == n  # nothing lost
    # distinct segments -> the hot term's work spread over all groups
    assert len({r["segment"] for r in rows}) == n // dps


def test_dense_doc_ids_property(spark):
    """docmap invariant: dense 0..n-1 ids in (conv_id, turn_idx)
    order, regardless of input partitioning/ordering — and the output
    partitions are disjoint doc_id ranges (the aligned-build
    precondition)."""
    import random

    from peterman_search_engine_spark.sources.adapters import (
        assign_dense_doc_ids,
    )

    rng = random.Random(11)
    rows = [
        (f"c{rng.randrange(40):03d}", t, f"text {i}")
        for i, t in enumerate(rng.sample(range(10_000), 300))
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = assign_dense_doc_ids(df.repartition(7), ["conv_id", "turn_idx"])
    got = [
        (r["conv_id"], r["turn_idx"], r["doc_id"])
        for r in out.select("conv_id", "turn_idx", "doc_id").collect()
    ]
    want_order = sorted({(c, t) for c, t, _ in rows})
    want = {(c, t): i for i, (c, t) in enumerate(want_order)}
    assert len(got) == len(rows)
    for c, t, d in got:
        assert want[(c, t)] == d
    # partitions are disjoint doc_id ranges
    pid_rows = out.select(
        F.spark_partition_id().alias("p"), "doc_id"
    ).groupBy("p").agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    spans = sorted((r["lo"], r["hi"]) for r in pid_rows.collect())
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 < l2
