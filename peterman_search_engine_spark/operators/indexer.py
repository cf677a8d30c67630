"""Index build & maintenance — SURVEY.md §2.2 (B1-B4, B8-B11).

Reference model (single-node Java LSM): buffer 1000 docs in a sorted
in-memory table, flush to an immutable on-disk segment, pairwise-merge
segments (``InvertedIndexManager.java:169-291``). Spark-first
re-expression:

* ``addDocument``/buffer (B1) -> one declarative dataflow:
  ``corpus -> analyze -> posexplode -> two-level aggregation``.
* segment (flush unit, B2) -> ``segment_id = doc_id // docs_per_segment``
  doc_id-range bucket. Posting lists are stored PER (segment, term), so
  no task ever materializes a full global posting list — a stop-word
  term at 10^12 turns splits across segments instead of one reducer.
  This is also the natural skew defuser: the shuffle key for posting
  construction is (segment, term, doc_id) and then (segment, term),
  both well-distributed even for terms occurring in 30%+ of turns.
* merge (B3/B4) -> ``merge_segments``: re-keying + TWO-PHASE SALTED
  aggregation by term (the old segment id is the salt), replacing the
  reference's manual two-pointer dictionary merge and docID rebasing
  (``IIM:905-953, 1035-1060``) — global dense doc_ids make rebasing
  unnecessary.
* compression (B5/B6) -> delta+varint blobs computed in ONE
  Arrow-vectorized pandas UDF per posting row (numpy, no per-int
  Python), plus per-block BM25 upper bounds for block-max WAND.
* DocStore (B10) -> the corpus table itself; point lookup = join on
  doc_id.

Build strategies, fastest first:

* ``postings_from_aligned_corpus`` — ZERO-SHUFFLE: requires the
  corpus partitioned into disjoint doc_id ranges (the docmap
  invariant); segment = input partition; ``mapInArrow`` builds each
  segment's rows from flat numpy buffers (vectorized byte tokenizer,
  grouped varint encode, Arrow arrays assembled from offsets+values
  buffers — no per-posting Python object anywhere).
* ``postings_from_corpus`` — ONE text shuffle ``groupBy(segment)``
  + applyInPandas, for corpora without the range-partition invariant.
* ``postings_from_tokens`` / ``postings_from_tokens_agg`` — exploded
  token-row forms (one/two shuffles), kept for plan comparison and
  for pre-tokenized inputs.

The analyzer is either pure-JVM column expressions (stem=False
doc-stats pass) or the vectorized byte-level ``tokenize_block``
inside the build UDF (stem=True supported via per-unique-term
stemming).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..functions.analysis import analyze_udf, tokens_expr
from ..functions.codec import (
    block_offsets,
    delta_varint_encode,
    delta_varint_encode_grouped,
)

K1 = 1.2
B = 0.75
DEFAULT_DOCS_PER_SEGMENT = 100_000
DEFAULT_BLOCK_SIZE = 128

_ENC_SCHEMA = StructType(
    [
        StructField("blob", BinaryType()),
        StructField("block_starts", ArrayType(LongType())),
        StructField("block_ubs", ArrayType(DoubleType())),
    ]
)

_ENC_SCHEMA_POS = StructType(
    list(_ENC_SCHEMA.fields)
    + [
        StructField("pos_blob", BinaryType()),
        StructField("pos_offsets", ArrayType(IntegerType())),
    ]
)


def encode_positions(pos_lists) -> tuple[bytes, np.ndarray]:
    """Compress one posting row's position lists: each doc's sorted
    list delta+varint-encoded independently (delta resets per doc,
    parity with SegmentInDiskManager.java:184-199), concatenated.
    Returns (blob bytes, int32 array of df+1 byte offsets)."""
    counts = np.fromiter((len(p) for p in pos_lists), np.int64, len(pos_lists))
    if counts.sum() == 0:
        return b"", np.zeros(len(counts) + 1, dtype=np.int32)
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists])
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    buf, offs = delta_varint_encode_grouped(flat, starts)
    return buf.tobytes(), offs.astype(np.int32)


def positions_decode_udf():
    """pandas UDF (pos_blob, pos_offsets) -> positions array<array<int>>.
    Used to re-expose the raw position lists of a PERSISTED index (the
    checkpoint layout stores only the compressed blob); thanks to
    Catalyst column pruning the decode runs only in plans that actually
    select `positions` — the phrase path instead partial-decodes single
    byte slices (operators.query.search_phrase)."""
    from ..functions.codec import delta_varint_decode

    @F.pandas_udf(ArrayType(ArrayType(IntegerType())))
    def _dec(blobs: pd.Series, offs: pd.Series) -> pd.Series:
        out = []
        for blob, o in zip(blobs, offs):
            if blob is None or o is None:
                out.append(None)
                continue
            oa = np.asarray(o, dtype=np.int64)
            out.append(
                [
                    delta_varint_decode(
                        blob, int(oa[i]), int(oa[i + 1] - oa[i])
                    ).astype(np.int32)
                    for i in range(len(oa) - 1)
                ]
            )
        return pd.Series(out)

    return _dec


def with_positions(postings: DataFrame) -> DataFrame:
    """Ensure a raw `positions` column exists, decoding the compressed
    blob when the DataFrame came from the persisted layout."""
    if "positions" in postings.columns:
        return postings
    return postings.withColumn(
        "positions", positions_decode_udf()(F.col("pos_blob"), F.col("pos_offsets"))
    )


def _bm25_tf_part(tf: np.ndarray, doc_len: np.ndarray, avg_len: float) -> np.ndarray:
    """The per-(term,doc) BM25 factor EXCLUDING idf:
    tf*(k1+1) / (tf + k1*(1-b+b*len/avglen)). idf is a per-term
    constant, so max of this over a block times idf is a valid block
    upper bound."""
    return tf * (K1 + 1) / (tf + K1 * (1 - B + B * doc_len / avg_len))


def _make_encode_udf(avg_len: float, block_size: int, *, positional: bool = False):
    schema = _ENC_SCHEMA_POS if positional else _ENC_SCHEMA

    def _encode_rows(cols) -> pd.DataFrame:
        doc_ids, tfs, doc_lens = cols[0], cols[1], cols[2]
        positions = cols[3] if positional else None
        out: dict[str, list] = {f.name: [] for f in schema.fields}
        for i, (ids, tf, dl) in enumerate(zip(doc_ids, tfs, doc_lens)):
            ids_a = np.asarray(ids, dtype=np.int64)
            out["blob"].append(delta_varint_encode(ids_a))
            tf_a = np.asarray(tf, dtype=np.float64)
            dl_a = np.asarray(dl, dtype=np.float64)
            part = _bm25_tf_part(tf_a, dl_a, avg_len)
            starts, ubs = [], []
            for s, e in block_offsets(len(ids_a), block_size):
                starts.append(int(ids_a[s]))
                ubs.append(float(part[s:e].max()))
            out["block_starts"].append(starts)
            out["block_ubs"].append(ubs)
            if positional:
                pb, po = encode_positions(positions[i])
                out["pos_blob"].append(pb)
                out["pos_offsets"].append(po)
        return pd.DataFrame(out)

    if positional:

        @F.pandas_udf(schema)
        def _encode(
            doc_ids: pd.Series, tfs: pd.Series, doc_lens: pd.Series,
            positions: pd.Series,
        ) -> pd.DataFrame:
            return _encode_rows((doc_ids, tfs, doc_lens, positions))

    else:

        @F.pandas_udf(schema)
        def _encode(
            doc_ids: pd.Series, tfs: pd.Series, doc_lens: pd.Series
        ) -> pd.DataFrame:
            return _encode_rows((doc_ids, tfs, doc_lens))

    return _encode


@dataclass
class InvertedIndex:
    """The built index: a set of DataFrames (or loaded Parquet tables).

    postings   (segment long, term string, df long, cf long,
                doc_ids array<long>, tfs array<int>,
                positions array<array<int>> | absent,
                blob binary, block_starts array<long>,
                block_ubs array<double>)
    term_stats (term string, df long, cf long)     [global]
    doc_stats  (doc_id long, doc_len int)
    n_docs     int
    avg_len    float
    """

    postings: DataFrame
    term_stats: DataFrame
    doc_stats: DataFrame
    n_docs: int
    avg_len: float
    positional: bool
    stem: bool
    # block granularity the stored block_starts/block_ubs were encoded
    # with — queries MUST slice blobs at this width, so it travels with
    # the index (persisted in stats.json) instead of being a caller
    # parameter that can silently disagree with the data.
    block_size: int = DEFAULT_BLOCK_SIZE
    # optional persisted narrow block-metadata table
    # (rid, segment, term, bi, lo, hi, ub) — lets WAND's prune phase
    # scan |postings|/block_size metadata rows without touching the
    # wide posting columns; derived lazily from postings when absent.
    block_meta: DataFrame | None = None
    # True when `positions` is a decode-UDF projection over
    # pos_blob/pos_offsets (loaded indexes) rather than a stored array
    # column — the phrase path then partial-decodes byte slices instead
    # of running the whole-column decode through the legacy array join.
    positions_decoded: bool = False
    # tombstoned doc_ids (one column, `doc_id long`), or None. Queries
    # exclude these docs from results while corpus-wide stats (df, N,
    # avg_len) stay as-built until operators.maintenance.compact_deletes
    # rewrites the postings — the standard large-index delete tradeoff
    # (metadata-sized delete now, one full rewrite amortized later).
    tombstones: DataFrame | None = None

    def num_segments(self) -> int:
        return self.postings.select("segment").distinct().count()

    def bm25_idf_col(self):
        """idf = ln(1 + (N - df + 0.5)/(df + 0.5)) as a Column over
        term_stats.df."""
        return F.log(
            F.lit(1.0)
            + (F.lit(float(self.n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )


def tokenize_corpus(corpus: DataFrame, *, stem: bool = True) -> DataFrame:
    """corpus(doc_id, text) -> (doc_id, tokens array<string>).
    stem=True: fused Arrow UDF (A4). stem=False: pure JVM expressions
    (A1) — JVM-side columnar scan, zero Python."""
    if stem:
        tok = analyze_udf(stem=True)(F.col("text"))
    else:
        tok = tokens_expr("text")
    return corpus.select("doc_id", tok.alias("tokens"))


DEFAULT_TERM_BUCKETS = 32


def _posting_schema(positional: bool, raw_positions: bool = True) -> StructType:
    fields = [
        StructField("segment", LongType()),
        StructField("term", StringType()),
        StructField("df", LongType()),
        StructField("cf", LongType()),
        StructField("doc_ids", ArrayType(LongType())),
        StructField("tfs", ArrayType(IntegerType())),
    ]
    if positional:
        fields += ([
            StructField("positions", ArrayType(ArrayType(IntegerType()))),
        ] if raw_positions else []) + [
            # compressed form of `positions`: each (term, doc)'s sorted
            # position list delta+varint-encoded independently (delta
            # resets per doc — parity with the reference's per-(term,doc)
            # position-list compression, SegmentInDiskManager.java:184-199),
            # concatenated into one blob per posting row. pos_offsets
            # holds df+1 byte offsets — the columnar analogue of the
            # reference's 10-byte position meta slots (posPage/posOffset/
            # posByteLength, SDM:36, 187-193) enabling PARTIAL decode of a
            # single doc's slice. The persisted layout stores ONLY the
            # blob (checkpoint drops the raw arrays).
            StructField("pos_blob", BinaryType()),
            StructField("pos_offsets", ArrayType(IntegerType())),
        ]
    fields += [
        StructField("blob", BinaryType()),
        StructField("block_starts", ArrayType(LongType())),
        StructField("block_ubs", ArrayType(DoubleType())),
    ]
    return StructType(fields)



def _empty_pdf(schema: StructType) -> pd.DataFrame:
    """Schema-shaped 0-row pandas frame with OBJECT dtype columns.
    ``pd.DataFrame({name: []})`` defaults every column to float64,
    which Arrow cannot convert to list/binary types ("NumPyConverter
    doesn't implement list<...>") — surfaced by groups whose documents
    tokenize to zero terms (empty or all-stop-word text)."""
    return pd.DataFrame({f.name: pd.Series(dtype=object) for f in schema.fields})


def postings_from_tokens(
    toks: DataFrame,
    *,
    avg_len: float,
    positional: bool = True,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    block_size: int = DEFAULT_BLOCK_SIZE,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    raw_positions: bool = True,
) -> DataFrame:
    """Posting construction: ONE shuffle on (segment, term-bucket)
    followed by an Arrow ``applyInPandas`` that builds every posting
    list of the group in numpy. toks = (doc_id, tokens array<string>).

    Why not groupBy+collect_list? Profiled on 600k turns: the
    collect_list-of-structs aggregation is allocation-bound inside the
    shared JVM heap and gets SLOWER from local[8] to local[32] (GC
    contention); the applyInPandas form moves the assembly into
    independent Python worker processes (no shared heap, no GIL
    sharing) and scales with cores. The shuffle key (segment,
    pmod(hash(term), term_buckets)) gives segments × buckets uniform
    groups — the segment id caps posting length (doc_id-range split)
    and the term bucket caps group width, so a stop-word-grade term at
    10^12 turns still never lands on one reducer.

    Returns (segment, term, df, cf, doc_ids, tfs, [positions], blob,
    block_starts, block_ubs); doc_ids/positions are sorted (reference
    invariant, ``InvertedIndexManager.java:228-244``).
    """
    exploded = toks.select(
        "doc_id",
        F.size("tokens").alias("doc_len"),
        F.posexplode("tokens").alias("pos", "term"),
    ).withColumn(
        "segment", (F.col("doc_id") / F.lit(docs_per_segment)).cast("long")
    ).withColumn(
        "tb", F.pmod(F.hash("term"), F.lit(term_buckets))
    )

    schema = _posting_schema(positional, raw_positions)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return _empty_pdf(schema)
        seg = int(pdf["segment"].iloc[0])
        terms = pdf["term"].to_numpy()
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        poss = pdf["pos"].to_numpy(dtype=np.int32)
        dlens = pdf["doc_len"].to_numpy(dtype=np.float64)
        tcodes, tinv = np.unique(terms, return_inverse=True)
        order = np.lexsort((poss, docs, tinv))
        tinv, docs, poss, dlens = tinv[order], docs[order], poss[order], dlens[order]
        # (term, doc) run boundaries
        pair_change = np.empty(len(docs), dtype=bool)
        pair_change[0] = True
        pair_change[1:] = (tinv[1:] != tinv[:-1]) | (docs[1:] != docs[:-1])
        pstart = np.flatnonzero(pair_change)
        pend = np.append(pstart[1:], len(docs))
        p_t = tinv[pstart]           # term code per (term,doc) pair
        p_doc = docs[pstart]
        p_tf = (pend - pstart).astype(np.int32)
        p_dlen = dlens[pstart]
        # term run boundaries over the pair arrays
        t_change = np.empty(len(p_t), dtype=bool)
        t_change[0] = True
        t_change[1:] = p_t[1:] != p_t[:-1]
        tstart = np.flatnonzero(t_change)
        tend = np.append(tstart[1:], len(p_t))

        out: dict[str, list] = {f.name: [] for f in schema.fields}
        for s, e in zip(tstart, tend):
            ids = p_doc[s:e]
            tfs = p_tf[s:e]
            part = _bm25_tf_part(tfs.astype(np.float64), p_dlen[s:e], avg_len)
            starts, ubs = [], []
            for bs, be in block_offsets(len(ids), block_size):
                starts.append(int(ids[bs]))
                ubs.append(float(part[bs:be].max()))
            out["segment"].append(seg)
            out["term"].append(tcodes[p_t[s]])
            out["df"].append(int(e - s))
            out["cf"].append(int(tfs.sum()))
            out["doc_ids"].append(ids)
            out["tfs"].append(tfs)
            if positional:
                # positions of the term's rows, split at pair bounds
                row_s, row_e = pstart[s], pend[e - 1]
                bounds = pstart[s + 1:e] - row_s
                if raw_positions:
                    out["positions"].append(
                        np.split(poss[row_s:row_e], bounds)
                    )
                pbuf, poffs = delta_varint_encode_grouped(
                    poss[row_s:row_e].astype(np.int64),
                    np.concatenate(([0], bounds)),
                )
                out["pos_blob"].append(pbuf.tobytes())
                out["pos_offsets"].append(poffs.astype(np.int32))
            out["blob"].append(delta_varint_encode(ids))
            out["block_starts"].append(starts)
            out["block_ubs"].append(ubs)
        return pd.DataFrame(out)

    return exploded.groupBy("segment", "tb").applyInPandas(_build, schema)


def postings_from_corpus(
    corpus: DataFrame,
    *,
    avg_len: float,
    stem: bool = True,
    positional: bool = True,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    block_size: int = DEFAULT_BLOCK_SIZE,
    raw_positions: bool = True,
) -> DataFrame:
    """Fully-fused posting construction: shuffle RAW (doc_id, text)
    rows by segment, then ONE applyInPandas per segment does
    tokenize + stop-filter + stem + posting assembly + varint encode
    in a single Python pass. ``raw_positions=False`` skips building
    the nested position arrays entirely (compressed blob only — the
    persisted contract).

    vs ``postings_from_tokens``: the shuffle moves |docs| compact text
    rows instead of |tokens| exploded rows (~15× fewer at transcript
    lengths), and the tokens never round-trip through Arrow at all.
    Group memory is bounded by docs_per_segment × avg doc bytes —
    docs_per_segment is the knob (semantic segment granularity AND
    the task-size cap). Output contract identical to
    ``postings_from_tokens``.
    """
    from ..functions.analysis import _analyze_py

    part = corpus.withColumn(
        "segment", (F.col("doc_id") / F.lit(docs_per_segment)).cast("long")
    )
    # EXPLICIT repartition by the group key: this stage is
    # Python-CPU-bound (~100x more CPU per shuffled byte than a JVM
    # stage), so AQE's byte-based coalescing — which would collapse the
    # compressed text shuffle to a handful of fat tasks and cap
    # parallelism below the core count — must not apply. A
    # user-specified numPartitions is exempt from AQE coalescing, and
    # hash-partitioning on "segment" satisfies the groupBy's required
    # distribution, so applyInPandas adds no second exchange.
    sc = corpus.sparkSession.sparkContext
    nparts = max(
        int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        sc.defaultParallelism * 4,
    )
    part = part.repartition(nparts, "segment")
    schema = _posting_schema(positional, raw_positions)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        return _build_group(
            pdf,
            stem=stem,
            positional=positional,
            avg_len=avg_len,
            block_size=block_size,
            schema=schema,
            raw_positions=raw_positions,
        )

    return part.groupBy("segment").applyInPandas(_build, schema)


def postings_from_aligned_corpus(
    corpus: DataFrame,
    *,
    avg_len: float,
    stem: bool = True,
    positional: bool = True,
    block_size: int = DEFAULT_BLOCK_SIZE,
    raw_positions: bool = True,
) -> DataFrame:
    """ZERO-SHUFFLE posting construction: requires the corpus to be
    partitioned into disjoint doc_id ranges — the invariant the docmap
    stage (``sources.adapters.assign_dense_doc_ids``) already
    guarantees, since dense doc_ids are assigned on the output of a
    ``repartitionByRange(conv_id, turn_idx)``. Segment = the input
    partition itself (a doc_id range), so every posting list is
    complete within one task and the build plan contains NO exchange:
    scan -> mapInPandas -> write. At 100 TB this is the difference
    between re-shuffling the whole corpus text and streaming each
    input split through a Python worker once; profiled on a 6M-turn
    corpus the text exchange was the single non-scaling component of
    the build (memory-bandwidth-bound), while this path scales with
    cores at ~0.9 efficiency.

    Output contract identical to ``postings_from_corpus``.

    Implementation is ``mapInArrow`` with buffer-level RecordBatch
    construction: every list/binary column is assembled from ONE flat
    numpy buffer plus an offsets array (Arrow's native layout), so no
    per-posting Python object ever exists on the output path — the
    pandas route (list-of-numpy-arrays cells -> ``pa.Table.from_pandas``
    element walk) was ~60% of the posting phase's CPU at 6M turns.

    ``raw_positions=False`` omits the raw ``positions`` column from the
    output (compressed ``pos_blob``/``pos_offsets`` only — the
    persisted contract): producing the ListArray itself is zero-copy,
    but the Arrow->row conversion of a nested array column whose bytes
    are then dropped on write is pure overhead — use False whenever the
    output goes straight to disk.
    """
    schema = _posting_schema(positional, raw_positions)

    def _build_part(batches):
        from pyspark import TaskContext

        seg = TaskContext.get().partitionId()
        blist = list(batches)
        if not blist:
            return
        tbl = pa.Table.from_batches(blist)
        if tbl.num_rows == 0:
            return
        out = _build_group_arrow(
            seg,
            tbl.column("doc_id").combine_chunks().to_numpy(),
            tbl.column("text").combine_chunks(),
            stem=stem,
            positional=positional,
            avg_len=avg_len,
            block_size=block_size,
            raw_positions=raw_positions,
        )
        if out is not None:
            yield out

    return corpus.mapInArrow(_build_part, schema)


def _build_group_arrow(
    seg: int,
    doc_ids: np.ndarray,
    text_col,
    *,
    stem: bool,
    positional: bool,
    avg_len: float,
    block_size: int,
    raw_positions: bool = True,
):
    """One segment's posting rows as a pyarrow RecordBatch built from
    flat buffers + offsets (no per-element Python on the output path).
    ``text_col`` is the combined pyarrow string array (its raw buffers
    feed the vectorized byte tokenizer zero-copy). Returns None for an
    empty group."""
    from ..functions.analysis import _analyze_py, tokenize_block
    from ..functions.codec import delta_varint_encode_grouped

    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tok = None
    if text_col.null_count == 0:
        bufs = text_col.buffers()
        off_dtype = (
            np.int64 if pa.types.is_large_string(text_col.type) else np.int32
        )
        offs = np.frombuffer(bufs[1], dtype=off_dtype)[
            text_col.offset: text_col.offset + len(text_col) + 1
        ]
        dat = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        if offs[0] != 0:
            offs = offs - offs[0]
            dat = dat[int(np.frombuffer(bufs[1], dtype=off_dtype)[text_col.offset]):]
        try:
            tok = tokenize_block(dat, offs, stem=stem)
        except ValueError:
            tok = None  # non-ascii -> unicode-exact fallback below
    if tok is not None:
        tcodes, tinv, tdoc, poss, dl = tok
        total = len(tinv)
        if total == 0:
            return None
        docs = doc_ids[tdoc]
        dlens = dl.astype(np.float64)[tdoc]
    else:
        texts = text_col.to_pylist()
        toks_list = [_analyze_py(t or "", stem) for t in texts]
        counts = np.fromiter(
            (len(t) for t in toks_list), np.int64, len(toks_list)
        )
        total = int(counts.sum())
        if total == 0:
            return None
        docs = np.repeat(doc_ids, counts)
        dlens = np.repeat(counts.astype(np.float64), counts)
        starts_rep = np.repeat(np.cumsum(counts) - counts, counts)
        poss = (np.arange(total) - starts_rep).astype(np.int32)
        terms = np.array(
            [tok_ for toks in toks_list for tok_ in toks], dtype=object
        )
        tcodes, tinv = np.unique(terms, return_inverse=True)
    order = np.lexsort((poss, docs, tinv))
    tinv, docs, poss, dlens = tinv[order], docs[order], poss[order], dlens[order]
    # (term, doc) pair boundaries over the sorted rows
    pair_change = np.empty(total, dtype=bool)
    pair_change[0] = True
    pair_change[1:] = (tinv[1:] != tinv[:-1]) | (docs[1:] != docs[:-1])
    pstart = np.flatnonzero(pair_change)
    P = len(pstart)
    pend = np.append(pstart[1:], total)
    p_t = tinv[pstart]
    p_doc = docs[pstart]
    p_tf = (pend - pstart).astype(np.int32)
    p_dlen = dlens[pstart]
    # term boundaries over the pair arrays
    t_change = np.empty(P, dtype=bool)
    t_change[0] = True
    t_change[1:] = p_t[1:] != p_t[:-1]
    tstart = np.flatnonzero(t_change)
    T = len(tstart)
    df = np.append(tstart[1:], P) - tstart  # pairs per term
    cf = np.add.reduceat(p_tf.astype(np.int64), tstart)
    # per-block metadata, vectorized: block starts are every
    # block_size-th pair WITHIN its term; reduceat gives block maxima
    pair_in_term = np.arange(P) - np.repeat(tstart, df)
    bidx = np.flatnonzero(pair_in_term % block_size == 0)
    bm = _bm25_tf_part(p_tf.astype(np.float64), p_dlen, avg_len)
    block_ub_vals = np.maximum.reduceat(bm, bidx) if P else np.empty(0)
    block_start_vals = p_doc[bidx]
    blocks_per_term = -(-df // block_size)
    boffs = np.concatenate(([0], np.cumsum(blocks_per_term)))
    # blobs: one vectorized pass over the whole segment
    blob_buf, blob_offs = delta_varint_encode_grouped(p_doc, tstart)

    pair_offs = np.append(tstart, P).astype(np.int64)
    i64 = pa.int64()
    cols = {
        "segment": pa.array(np.full(T, seg, dtype=np.int64), i64),
        "term": pa.array(tcodes[p_t[tstart]], pa.string()),
        "df": pa.array(df.astype(np.int64), i64),
        "cf": pa.array(cf, i64),
        "doc_ids": pa.ListArray.from_arrays(
            pa.array(pair_offs, pa.int32()), pa.array(p_doc, i64)
        ),
        "tfs": pa.ListArray.from_arrays(
            pa.array(pair_offs, pa.int32()), pa.array(p_tf, pa.int32())
        ),
    }
    if positional:
        if raw_positions:
            inner = pa.ListArray.from_arrays(
                pa.array(np.append(pstart, total).astype(np.int64), pa.int32()),
                pa.array(poss, pa.int32()),
            )
            cols["positions"] = pa.ListArray.from_arrays(
                pa.array(pair_offs, pa.int32()), inner
            )
        # compressed positions: ONE grouped varint pass over the whole
        # segment's position stream (delta resets at every (term, doc)
        # pair), then zero-copy slicing into per-term blobs + per-pair
        # byte offsets (the reference's position meta slots, SDM:187-193)
        pos_buf, pos_b = delta_varint_encode_grouped(
            poss.astype(np.int64), pstart
        )
        cols["pos_blob"] = pa.Array.from_buffers(
            pa.binary(),
            T,
            [
                None,
                pa.py_buffer(
                    np.append(pos_b[tstart], pos_b[-1]).astype(np.int32)
                ),
                pa.py_buffer(pos_buf),
            ],
        )
        # per-term list of df+1 byte offsets, relative to the term's
        # blob start: entry k of term t is pos_b[tstart[t]+k] - pos_b[tstart[t]]
        po_counts = (df + 1).astype(np.int64)
        po_loffs = np.concatenate(([0], np.cumsum(po_counts)))
        po_tid = np.repeat(np.arange(T), po_counts)
        po_k = np.arange(po_loffs[-1]) - po_loffs[po_tid]
        po_vals = pos_b[tstart[po_tid] + po_k] - pos_b[tstart[po_tid]]
        cols["pos_offsets"] = pa.ListArray.from_arrays(
            pa.array(po_loffs, pa.int32()),
            pa.array(po_vals.astype(np.int32), pa.int32()),
        )
    cols["blob"] = pa.Array.from_buffers(
        pa.binary(),
        T,
        [None, pa.py_buffer(blob_offs.astype(np.int32)), pa.py_buffer(blob_buf)],
    )
    cols["block_starts"] = pa.ListArray.from_arrays(
        pa.array(boffs, pa.int32()), pa.array(block_start_vals, i64)
    )
    cols["block_ubs"] = pa.ListArray.from_arrays(
        pa.array(boffs, pa.int32()), pa.array(block_ub_vals, pa.float64())
    )
    return pa.RecordBatch.from_arrays(list(cols.values()), names=list(cols.keys()))


def _build_group(
    pdf: pd.DataFrame,
    *,
    stem: bool,
    positional: bool,
    avg_len: float,
    block_size: int,
    schema: StructType,
    raw_positions: bool = True,
) -> pd.DataFrame:
    """Build every posting row of one segment group in numpy:
    tokenize + stop-filter + stem + lexsort + run-length boundaries +
    varint encode + per-block BM25 upper bounds. ``pdf`` must carry
    (segment, doc_id, text) with a single segment value. Analysis runs
    through the vectorized byte tokenizer (same as the mapInArrow
    path); non-ASCII batches fall back to the per-string analyzer."""
    from ..functions.analysis import _analyze_py, tokenize_block

    if len(pdf) == 0:
        return _empty_pdf(schema)
    seg = int(pdf["segment"].iloc[0])
    doc_ids_np = pd.to_numeric(pdf["doc_id"]).to_numpy(np.int64)
    tok = None
    try:
        arr = pa.array(
            pdf["text"].map(lambda t: t if t is not None else ""), pa.string()
        )
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int32)[: len(arr) + 1]
        dat = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        tok = tokenize_block(dat, offs, stem=stem)
    except (ValueError, pa.lib.ArrowException):
        # non-ascii (ValueError) or an Arrow construction limit —
        # either way the per-string analyzer below is the exact path
        tok = None
    if tok is not None:
        tcodes, tinv, tdoc, poss, dl = tok
        total = len(tinv)
        if total == 0:
            return _empty_pdf(schema)
        docs = doc_ids_np[tdoc]
        dlens = dl.astype(np.float64)[tdoc]
    else:
        toks_list = [_analyze_py(t or "", stem) for t in pdf["text"]]
        counts = np.fromiter(
            (len(t) for t in toks_list), np.int64, len(toks_list)
        )
        total = int(counts.sum())
        if total == 0:
            return _empty_pdf(schema)
        docs = np.repeat(doc_ids_np, counts)
        dlens = np.repeat(counts.astype(np.float64), counts)
        # per-doc position = global index minus the doc's start offset
        starts_rep = np.repeat(np.cumsum(counts) - counts, counts)
        poss = (np.arange(total) - starts_rep).astype(np.int32)
        terms = np.array(
            [tok_ for toks in toks_list for tok_ in toks], dtype=object
        )
        tcodes, tinv = np.unique(terms, return_inverse=True)
    order = np.lexsort((poss, docs, tinv))
    tinv, docs, poss, dlens = tinv[order], docs[order], poss[order], dlens[order]
    pair_change = np.empty(total, dtype=bool)
    pair_change[0] = True
    pair_change[1:] = (tinv[1:] != tinv[:-1]) | (docs[1:] != docs[:-1])
    pstart = np.flatnonzero(pair_change)
    pend = np.append(pstart[1:], total)
    p_t = tinv[pstart]
    p_doc = docs[pstart]
    p_tf = (pend - pstart).astype(np.int32)
    p_dlen = dlens[pstart]
    t_change = np.empty(len(p_t), dtype=bool)
    t_change[0] = True
    t_change[1:] = p_t[1:] != p_t[:-1]
    tstart = np.flatnonzero(t_change)
    tend = np.append(tstart[1:], len(p_t))

    out: dict[str, list] = {f.name: [] for f in schema.fields}
    for s, e in zip(tstart, tend):
        ids = p_doc[s:e]
        tfs = p_tf[s:e]
        bm = _bm25_tf_part(tfs.astype(np.float64), p_dlen[s:e], avg_len)
        bstarts, ubs = [], []
        for bs, be in block_offsets(len(ids), block_size):
            bstarts.append(int(ids[bs]))
            ubs.append(float(bm[bs:be].max()))
        out["segment"].append(seg)
        out["term"].append(tcodes[p_t[s]])
        out["df"].append(int(e - s))
        out["cf"].append(int(tfs.sum()))
        out["doc_ids"].append(ids)
        out["tfs"].append(tfs)
        if positional:
            row_s, row_e = pstart[s], pend[e - 1]
            bounds = pstart[s + 1:e] - row_s
            if raw_positions:
                out["positions"].append(np.split(poss[row_s:row_e], bounds))
            pbuf, poffs = delta_varint_encode_grouped(
                poss[row_s:row_e].astype(np.int64),
                np.concatenate(([0], bounds)),
            )
            out["pos_blob"].append(pbuf.tobytes())
            out["pos_offsets"].append(poffs.astype(np.int32))
        out["blob"].append(delta_varint_encode(ids))
        out["block_starts"].append(bstarts)
        out["block_ubs"].append(ubs)
    return pd.DataFrame(out)




def postings_from_tokens_agg(
    toks: DataFrame,
    *,
    avg_len: float,
    positional: bool = True,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> DataFrame:
    """The declarative two-shuffle (groupBy + collect_list) form of
    posting construction — kept for plan comparison and as a fallback
    where applyInPandas is undesirable. Identical output contract."""
    # (doc_id, doc_len, pos, term); positions are post-stop-filter
    # indexes (IIM:173-184) because the analyzer already filtered.
    exploded = toks.select(
        "doc_id",
        F.size("tokens").alias("doc_len"),
        F.posexplode("tokens").alias("pos", "term"),
    )
    seg = (F.col("doc_id") / F.lit(docs_per_segment)).cast("long").alias("segment")

    # shuffle 1: per (segment, term, doc) tf + sorted positions.
    td = exploded.groupBy(seg, "term", "doc_id").agg(
        F.count("*").cast("int").alias("tf"),
        F.first("doc_len").alias("doc_len"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )

    # shuffle 2: per (segment, term) sorted posting list. sort_array on
    # struct sorts by the first field (doc_id) — reference invariant
    # "postings sorted by docID" (IIM:228-234).
    plist = F.sort_array(
        F.collect_list(F.struct("doc_id", "tf", "positions", "doc_len"))
    ).alias("plist")
    seg_postings = td.groupBy("segment", "term").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        plist,
    )
    cols = [
        "segment",
        "term",
        "df",
        "cf",
        F.col("plist.doc_id").alias("doc_ids"),
        F.col("plist.tf").alias("tfs"),
    ]
    if positional:
        cols.append(F.col("plist.positions").alias("positions"))
    cols.append(F.col("plist.doc_len").alias("_doc_lens"))
    seg_postings = seg_postings.select(*cols)

    enc_cols = [F.col("doc_ids"), F.col("tfs"), F.col("_doc_lens")]
    if positional:
        enc_cols.append(F.col("positions"))
    enc = _make_encode_udf(avg_len, block_size, positional=positional)(*enc_cols)
    out = seg_postings.withColumn("_enc", enc)
    for f in (_ENC_SCHEMA_POS if positional else _ENC_SCHEMA).fields:
        out = out.withColumn(f.name, F.col(f"_enc.{f.name}"))
    return out.select([f.name for f in _posting_schema(positional).fields])


def build_index(
    corpus: DataFrame,
    *,
    stem: bool = True,
    positional: bool = True,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> InvertedIndex:
    """B1+B2: the full batch index build. corpus = (doc_id, text).

    Pass 1 (stats): doc_len per doc via the PURE-JVM tokenizer
    expression — stemming never changes token counts, so the count of
    the A1-filtered list equals the analyzed length; zero Python,
    JVM-side. Pass 2 (postings): the fused per-segment
    applyInPandas (``postings_from_corpus``).
    """
    doc_stats = corpus.select(
        "doc_id", F.size(tokens_expr("text")).alias("doc_len")
    )
    row = doc_stats.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avg")
    ).collect()[0]
    n_docs, avg_len = int(row["n"]), float(row["avg"] or 0.0)

    seg_postings = postings_from_corpus(
        corpus,
        avg_len=avg_len,
        stem=stem,
        positional=positional,
        docs_per_segment=docs_per_segment,
        block_size=block_size,
    )

    # Global term stats: input is one row per (segment, term) — already
    # partially aggregated, so this groupBy(term) moves only
    # #segments×#terms rows, never postings. (Q6/Q10.)
    term_stats = seg_postings.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )

    return InvertedIndex(
        postings=seg_postings,
        term_stats=term_stats,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avg_len=avg_len,
        positional=positional,
        stem=stem,
        block_size=block_size,
    )


def merge_segments(
    index: InvertedIndex,
    *,
    factor: int = 2,
    block_size: int | None = None,
) -> InvertedIndex:
    """B3/B4 mergeAllSegments: coalesce groups of ``factor`` adjacent
    segments (reference merges pairs, halving the count —
    ``IIM:277-290``; factor=2 reproduces that).

    Two-phase salted aggregation by term: phase 1 is implicit (the
    input is already one row per (old segment, term) — the old segment
    id IS the salt), phase 2 groups by (new_segment, term) and
    flattens. Because input segments are doc_id ranges and structs
    sort by doc_id, sort_array(flatten(...)) restores the global
    doc_id order — no docID rebasing needed (global dense ids; the
    reference instead rebases seg2 ids by +size(seg1), IIM:1054-1056).
    """
    if block_size is None:
        block_size = index.block_size
    p = index.postings
    if index.positional:
        p = with_positions(p)  # loaded indexes carry only the compressed blob
    p = p.withColumn(
        "segment", (F.col("segment") / F.lit(factor)).cast("long")
    )
    part_fields = ["doc_ids", "tfs"] + (["positions"] if index.positional else [])
    # One struct per OLD segment, keyed by its first doc_id; sorting
    # those structs and flattening restores global doc_id order because
    # old segments are disjoint doc_id ranges.
    part = F.struct(
        F.element_at("doc_ids", 1).alias("_k"),
        F.struct(*part_fields).alias("v"),
    )
    merged = p.groupBy("segment", "term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.sort_array(F.collect_list(part)).alias("_parts"),
    )
    merged = merged.select(
        "segment", "term", "df", "cf",
        *[F.flatten(F.col(f"_parts.v.{f}")).alias(f) for f in part_fields],
    )
    # Re-encode blobs/blocks for the merged lists. Per-doc lengths are
    # recovered from doc_stats via an explode + join; Catalyst/AQE
    # picks broadcast vs sort-merge by doc_stats size.
    dl = index.doc_stats
    with_len = (
        merged.select("segment", "term", F.explode("doc_ids").alias("_d"))
        .join(dl, F.col("_d") == dl.doc_id, "left")
        .groupBy("segment", "term")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_d").alias("doc_id"), F.col("doc_len")))
            ).alias("_dl")
        )
        .select("segment", "term", F.col("_dl.doc_len").alias("_doc_lens"))
    )
    merged = merged.join(with_len, ["segment", "term"])
    enc_cols = [F.col("doc_ids"), F.col("tfs"), F.col("_doc_lens")]
    if index.positional:
        enc_cols.append(F.col("positions"))
    enc = _make_encode_udf(index.avg_len, block_size, positional=index.positional)(
        *enc_cols
    )
    merged = merged.withColumn("_enc", enc)
    for f in (_ENC_SCHEMA_POS if index.positional else _ENC_SCHEMA).fields:
        merged = merged.withColumn(f.name, F.col(f"_enc.{f.name}"))
    merged = merged.select([f.name for f in _posting_schema(index.positional).fields])
    return InvertedIndex(
        postings=merged,
        term_stats=index.term_stats,
        doc_stats=index.doc_stats,
        n_docs=index.n_docs,
        avg_len=index.avg_len,
        positional=index.positional,
        stem=index.stem,
        block_size=block_size,
    )
