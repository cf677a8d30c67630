"""Position-list compression (SDM:184-199 parity).

The positional posting row carries `pos_blob` (each (term,doc)'s
sorted position list delta+varint-encoded independently, concatenated)
and `pos_offsets` (df+1 byte offsets — the columnar analogue of the
reference's 10-byte position meta slots, SDM:36, 187-193). The
persisted layout stores ONLY the blob; loads re-expose a decoded
column, and the phrase path partial-decodes candidate byte slices.
"""

import shutil

import pytest

from peterman_search_engine_spark.functions.codec import delta_varint_decode
from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators.indexer import (
    build_index,
    merge_segments,
    with_positions,
)
from peterman_search_engine_spark.oracle.pyoracle import OracleIndex
from peterman_search_engine_spark.plans.checkpoint import (
    build_index_checkpointed,
    load_index,
)

PHRASES = [["fast", "table"], ["spark", "merge"], ["the"]]


def _assert_blob_matches_positions(rows):
    assert rows
    n_checked = 0
    for r in rows:
        offs = r["pos_offsets"]
        assert len(offs) == len(r["positions"]) + 1
        for i, pl in enumerate(r["positions"]):
            dec = delta_varint_decode(
                bytes(r["pos_blob"]), offs[i], offs[i + 1] - offs[i]
            )
            assert list(dec) == list(pl)
            n_checked += 1
    assert n_checked > 0


@pytest.fixture(scope="module")
def small_index(tiny_corpus):
    return build_index(
        tiny_corpus, stem=False, positional=True, docs_per_segment=40
    )


def test_pos_blob_roundtrips_every_build_row(small_index):
    _assert_blob_matches_positions(small_index.postings.collect())


def test_pos_blob_survives_merge(small_index):
    merged = merge_segments(small_index, factor=10**6)
    _assert_blob_matches_positions(merged.postings.collect())


def test_checkpoint_stores_only_compressed_positions(
    spark, tiny_corpus, tiny_corpus_rows, tmp_path
):
    d = str(tmp_path / "idx")
    shutil.rmtree(d, ignore_errors=True)
    build_index_checkpointed(
        tiny_corpus, d, stem=False, positional=True,
        docs_per_segment=40, segments_per_group=2,
    )
    ondisk = spark.read.parquet(d + "/postings")
    assert "positions" not in ondisk.columns
    assert {"pos_blob", "pos_offsets"} <= set(ondisk.columns)

    lidx = load_index(spark, d)
    # decoded column equals the in-memory build's raw positions
    mem = build_index(tiny_corpus, stem=False, positional=True, docs_per_segment=40)
    a = {
        (r["segment"], r["term"]): [list(x) for x in r["positions"]]
        for r in mem.postings.collect()
    }
    b = {
        (r["segment"], r["term"]): [list(x) for x in r["positions"]]
        for r in lidx.postings.select("segment", "term", "positions").collect()
    }
    assert a == b

    oracle = OracleIndex(tiny_corpus_rows, stem=False)
    for phrase in PHRASES:
        got = sorted(r["doc_id"] for r in Q.search_phrase(lidx, phrase).collect())
        assert got == sorted(oracle.search_phrase(phrase)), phrase


def test_phrase_partial_decode_matches_array_path(
    small_index, tiny_corpus_rows
):
    """The compressed partial-decode plan and the legacy array-column
    plan must agree with the pure-Python oracle."""
    import dataclasses

    oracle = OracleIndex(tiny_corpus_rows, stem=False)
    no_blob = dataclasses.replace(
        small_index,
        postings=small_index.postings.drop("pos_blob", "pos_offsets"),
    )
    no_raw = dataclasses.replace(
        small_index, postings=small_index.postings.drop("positions")
    )
    for phrase in PHRASES:
        exp = sorted(oracle.search_phrase(phrase))
        legacy = sorted(
            r["doc_id"] for r in Q.search_phrase(no_blob, phrase).collect()
        )
        partial = sorted(
            r["doc_id"] for r in Q.search_phrase(no_raw, phrase).collect()
        )
        assert legacy == exp, phrase
        assert partial == exp, phrase


def test_with_positions_decode(small_index):
    p2 = with_positions(small_index.postings.drop("positions"))
    a = {
        (r["segment"], r["term"]): [list(x) for x in r["positions"]]
        for r in small_index.postings.collect()
    }
    b = {
        (r["segment"], r["term"]): [list(x) for x in r["positions"]]
        for r in p2.collect()
    }
    assert a == b
