"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (plus the training-data pipeline operators); each has a
DuckDB-runnable ``oracle_sql()`` twin built in
``peterman_search_engine_spark.oracle.sqlgen``. Scores are emitted as
``ROUND(x*1e6)`` BIGINT columns on BOTH sides so the driver's
order-insensitive value-hash compares exact integers, and every
LIMIT/top-k ranks on the rounded value with a doc_id tiebreak so the
selected row set is engine-independent.

Driver-gated queries run the A1 tokenize-only analyzer (DuckDB's
Porter extension is unavailable offline); the Porter-stemmed pipeline
(A3/A4) is verified by pytest against the pure-Python oracle
(tests/test_index_vs_oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peterman_search_engine_spark.functions import textstats as TS
from peterman_search_engine_spark.functions.analysis import tokens_expr
from peterman_search_engine_spark.operators import dedup as DD
from peterman_search_engine_spark.operators import query as Q
from peterman_search_engine_spark.operators import ranking as RK
from peterman_search_engine_spark.operators import similarity as SIM
from peterman_search_engine_spark.operators.indexer import build_index, merge_segments
from peterman_search_engine_spark.operators.wand import bm25_topk_wand
from peterman_search_engine_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
)
from peterman_search_engine_spark.operators.pagerank import pagerank
from peterman_search_engine_spark.oracle import sqlgen as S
from peterman_search_engine_spark.sources.adapters import corpus_from_documents
from peterman_search_engine_spark.sources.graph import generate_edges

_INDEX_CACHE: dict = {}

AND_TERMS = ["spark", "merge", "window"]
OR_TERMS = ["vector", "stream"]
PHRASE = ["fast", "table"]
BM25_TERMS = ["spark", "merge"]
TFIDF_TERMS = ["query", "data", "data"]  # duplicate exercises query tf
POSTING_TERMS = ["spark", "vector", "customer"]
KEYWORD = "vector"
TOP_K = 10
PR_ITERS = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_from_documents(_docs(spark, sf_dir))


def _index(
    spark: SparkSession, sf_dir: str, *, single_segment: bool = False,
    stem: bool = False,
):
    key = (id(spark), sf_dir, single_segment, stem)
    if key not in _INDEX_CACHE:
        if single_segment:
            dps = 10**12
        else:
            # segment count scales with corpus size (~64 doc_id-range
            # segments => 2 waves on 32 cores), floored at 200 docs so
            # the sf0.001 fixture still exercises multi-segment logic
            n = _docs(spark, sf_dir).count()
            dps = max(200, -(-n // 64))
        idx = build_index(
            _corpus(spark, sf_dir), stem=stem, positional=True, docs_per_segment=dps
        )
        idx.postings = idx.postings.localCheckpoint(eager=True)
        idx.doc_stats = idx.doc_stats.localCheckpoint(eager=True)
        idx.term_stats = idx.term_stats.localCheckpoint(eager=True)
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _e6(col):
    return F.round(col * 1_000_000).cast("long")


def _ranked_e6(scored: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    return (
        scored.withColumn("score_e6", _e6(F.col("score")))
        .select(id_col, "score_e6")
        .orderBy(F.desc("score_e6"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_and(spark, sf):
    return Q.search_and(_index(spark, sf), AND_TERMS)


def q_or(spark, sf):
    return Q.search_or(_index(spark, sf), OR_TERMS)


def q_keyword(spark, sf):
    """Q1 searchQuery: single-keyword search (analyze -> AND)."""
    return Q.search_keyword(_index(spark, sf), KEYWORD)


def q_doc_iterator(spark, sf):
    """Q11 documentIterator: full corpus scan via the DocStore
    analogue (the corpus table itself), text hashed portably."""
    from peterman_search_engine_spark.functions.textstats import md5_long

    return _corpus(spark, sf).select("doc_id", md5_long(F.col("text")).alias("text_hash"))


def q_full_scan(spark, sf):
    """Q13 FullScanSearcher: the reference's debug oracle re-stated as
    a DataFrame filter (no index)."""
    return Q.full_scan_search(_corpus(spark, sf), AND_TERMS, stem=False)


def q_phrase(spark, sf):
    return Q.search_phrase(_index(spark, sf), PHRASE)


PROX_TERMS = ["spark", "merge"]
PROX_SLOP = 8


def q_proximity(spark, sf):
    """Unordered WITHIN-slop search: both terms inside an 8-token
    window — strictly between phrase (slop=1 ordered) and AND
    (slop=inf) selectivity."""
    return Q.search_proximity(_index(spark, sf), PROX_TERMS, PROX_SLOP)


NOT_INCLUDE = ["merge"]
NOT_EXCLUDE = ["vector", "stream"]
PREFIX = "st"
FILTER_LANG = "en"
SNIP_WIDTH = 3
FACET_COL = "lang"


def q_not(spark, sf):
    """Boolean AND-NOT: docs with all include terms and none of the
    exclude terms (completes the boolean algebra beyond the
    reference's AND/OR)."""
    return Q.search_and_not(_index(spark, sf), NOT_INCLUDE, NOT_EXCLUDE)


def q_prefix(spark, sf):
    """Wildcard prefix* search: StringStartsWith pushed to the term
    dictionary scan."""
    return Q.search_prefix(_index(spark, sf), PREFIX)


def q_bm25_filtered(spark, sf):
    """Metadata-filtered BM25: rank only lang='en' docs while idf/N/
    avg_len stay corpus-wide, so scores equal the unfiltered run."""
    idx = _index(spark, sf)
    allowed = _docs(spark, sf).filter(F.col("lang") == FILTER_LANG)
    return _ranked_e6(
        Q.search_bm25_filtered(idx, BM25_TERMS, allowed, None), TOP_K
    )


def q_snippets(spark, sf):
    """Result snippets: +-3-token window around the first query-term
    hit, for every doc matching AND(AND_TERMS)."""
    hits = Q.search_and(_index(spark, sf), AND_TERMS)
    return Q.snippets(
        _corpus(spark, sf), hits, AND_TERMS, stem=False, width=SNIP_WIDTH
    )


def q_facets(spark, sf):
    """Facet counts: the OR(OR_TERMS) result set bucketed by lang."""
    hits = Q.search_or(_index(spark, sf), OR_TERMS)
    return Q.facet_counts(hits, _docs(spark, sf), FACET_COL)


def q_bm25(spark, sf):
    idx = _index(spark, sf)
    return _ranked_e6(Q.bm25_scores(idx, BM25_TERMS), TOP_K)


def q_bm25_cold(spark, sf):
    """BM25 top-k served from the PERSISTED index layout: build once
    through plans/checkpoint (parquet tables + manifest commit), then
    load_index() and query purely from storage — the path every query
    takes at 100 TB (the reference re-opens segment files per query,
    SegmentInDiskManager.java:259-341). Same oracle as bm25_topk: the
    persisted layout must be query-identical to the in-session index.
    scripts/cold_query.py measures this path's latency from a fresh
    process for BENCH (p95_query_sec_cold)."""
    import hashlib
    import os as _os

    from peterman_search_engine_spark.plans.checkpoint import (
        build_index_checkpointed,
        load_index,
    )

    tag = hashlib.sha1(sf.encode()).hexdigest()[:10]
    work = f"/tmp/pse_entry_cold_{tag}"
    if not _os.path.exists(_os.path.join(work, "stats.json")):
        n = _docs(spark, sf).count()
        build_index_checkpointed(
            _corpus(spark, sf), work,
            stem=False, positional=True,
            docs_per_segment=max(200, -(-n // 64)),
        )
    idx = load_index(spark, work)
    return _ranked_e6(Q.bm25_scores(idx, BM25_TERMS), TOP_K)


def q_tfidf(spark, sf):
    idx = _index(spark, sf)
    return _ranked_e6(Q.tfidf_scores(idx, TFIDF_TERMS), TOP_K)


def q_streaming_bm25(spark, sf):
    """Structured-Streaming-shaped incremental build (two micro-batch
    ingests through the foreachBatch body) must be rank-identical to a
    batch rebuild — same SQL oracle as bm25_topk. Dense doc_ids are
    re-derived from the stable ordering, matching the table's own ids."""
    import shutil
    import tempfile

    from peterman_search_engine_spark.operators import query as QQ
    from peterman_search_engine_spark.streaming.incremental import (
        ingest_batch,
        load_streaming_index,
    )

    key = ("stream", id(spark), sf)
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="pse_entry_stream_")
        shutil.rmtree(d, ignore_errors=True)
        docs = _docs(spark, sf).select(
            F.format_string("c%09d", F.col("doc_id").cast("long")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            "text",
            F.col("doc_id").cast("long").alias("_id"),
        )
        mid = docs.agg(F.avg("_id")).collect()[0][0]
        ingest_batch(
            docs.filter(F.col("_id") < mid).drop("_id"), d, 0,
            stem=False, docs_per_segment=200,
        )
        ingest_batch(
            docs.filter(F.col("_id") >= mid).drop("_id"), d, 1,
            stem=False, docs_per_segment=200,
        )
        idx = load_streaming_index(spark, d)
        idx.postings = idx.postings.localCheckpoint(eager=True)
        idx.doc_stats = idx.doc_stats.localCheckpoint(eager=True)
        idx.term_stats = idx.term_stats.localCheckpoint(eager=True)
        _INDEX_CACHE[key] = idx
    return _ranked_e6(Q.bm25_scores(_INDEX_CACHE[key], BM25_TERMS), TOP_K)


def q_wordbreak(spark, sf):
    """A6 word-break DP tokenizer, distributed: analyzed tokens
    restricted to the demo dictionary are concatenated space-free per
    doc and segmented back by the DP. No SQL oracle (DP segmentation
    is not expressible in portable SQL) — the driver records the
    rows-only check; exact semantics are golden-tested in
    tests/test_wordbreak.py."""
    from peterman_search_engine_spark.functions.wordbreak import (
        DEMO_FREQ,
        word_break_udf,
    )

    dict_words = sorted(DEMO_FREQ)
    toks = F.filter(tokens_expr("text"), lambda t: t.isin(*dict_words))
    joined = _corpus(spark, sf).select(
        "doc_id", F.concat_ws("", toks).alias("glued")
    ).filter(F.length("glued") > 0)
    return joined.select(
        "doc_id",
        F.posexplode(word_break_udf()(F.col("glued"))).alias("pos", "term"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "term")


def q_bm25_stemmed(spark, sf):
    """A3/A4 driver gate: BM25 over the PORTER-STEMMED index (the
    reference's default analyzer is tokenizer ∘ stemmer,
    ComposableAnalyzer.java:21-23). DuckDB has no offline stemmer, so
    the oracle reads a stemmed-token fixture generated by the shared
    pure-Python analyzer (``oracle_sql`` builds it) — the Spark side
    runs the real vectorized stemmed pipeline end-to-end."""
    idx = _index(spark, sf, stem=True)
    return _ranked_e6(Q.bm25_scores(idx, BM25_TERMS), TOP_K)


def q_bm25_wand(spark, sf):
    """Block-max WAND BM25 in its SHIPPED configuration: the cost gate
    compares the query's posting volume (Σ df from term_stats) against
    the pruned plan's fixed overhead and picks exhaustive vs pruned —
    either way exact, same oracle SQL as bm25_topk."""
    idx = _index(spark, sf)
    scored = bm25_topk_wand(idx, BM25_TERMS, TOP_K * 3)
    return _ranked_e6(scored, TOP_K)


def q_bm25_wand_forced(spark, sf):
    """The pruned block-max plan itself (gate bypassed) — must equal
    the exhaustive plan (same oracle SQL as bm25_topk)."""
    idx = _index(spark, sf)
    scored = bm25_topk_wand(idx, BM25_TERMS, TOP_K * 3, force_prune=True)
    return _ranked_e6(scored, TOP_K)


def q_merged_postings(spark, sf):
    """Postings dump after merging all segments into one (B3/B4) —
    merge must preserve posting content, so the oracle is the same as
    postings_dump."""
    idx = _index(spark, sf)
    merged = merge_segments(idx, factor=10**6)
    p = merged.postings.filter(F.col("term").isin(POSTING_TERMS))
    return p.select(
        "term", F.explode(F.arrays_zip("doc_ids", "tfs", "positions")).alias("z")
    ).select(
        "term",
        F.col("z.doc_ids").alias("doc_id"),
        F.col("z.tfs").cast("long").alias("tf"),
        F.element_at(F.col("z.positions"), 1).cast("long").alias("first_pos"),
    )


def q_term_stats(spark, sf):
    idx = _index(spark, sf)
    return (
        idx.term_stats.select("term", "df", "cf")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


def q_doc_stats(spark, sf):
    idx = _index(spark, sf)
    return idx.doc_stats.select("doc_id", F.col("doc_len").cast("long").alias("doc_len"))


def q_postings(spark, sf):
    idx = _index(spark, sf)
    p = idx.postings.filter(F.col("term").isin(POSTING_TERMS))
    return p.select(
        "term", F.explode(F.arrays_zip("doc_ids", "tfs", "positions")).alias("z")
    ).select(
        "term",
        F.col("z.doc_ids").alias("doc_id"),
        F.col("z.tfs").cast("long").alias("tf"),
        F.element_at(F.col("z.positions"), 1).cast("long").alias("first_pos"),
    )


def q_compressed_size(spark, sf):
    """B5-B7: delta+varint bytes vs naive 4-byte bytes, for BOTH the
    doc_id posting blob and the per-(term,doc) position blob (position
    lists compressed with delta reset per doc — SDM:184-199 parity)."""
    idx = _index(spark, sf, single_segment=True)
    return (
        idx.postings.select(
            "term",
            F.length("blob").cast("long").alias("blob_bytes"),
            (F.col("df") * 4).cast("long").alias("naive_bytes"),
            F.length("pos_blob").cast("long").alias("pos_blob_bytes"),
            (F.col("cf") * 4).cast("long").alias("pos_naive_bytes"),
        )
        .orderBy(F.desc("blob_bytes"), F.asc("term"))
        .limit(50)
    )


def q_phrase_compressed(spark, sf):
    """Q4 over COMPRESSED-ONLY positions: the raw `positions` column is
    dropped so the plan must cut per-(term,doc) byte slices from
    pos_blob via pos_offsets and partial-decode only candidate docs —
    the exact plan a persisted index runs. Same oracle as
    phrase_search."""
    import dataclasses

    idx = _index(spark, sf)
    idx2 = dataclasses.replace(idx, postings=idx.postings.drop("positions"))
    return Q.search_phrase(idx2, PHRASE)


DELETE_MOD = 7
DELETE_REM = 3


def _tombstoned_index(spark, sf):
    """The shared index with every doc_id ≡ 3 (mod 7) tombstoned —
    ~1/7 of the corpus deleted as metadata only."""
    from peterman_search_engine_spark.operators import maintenance as M

    idx = _index(spark, sf)
    tomb = _docs(spark, sf).select(
        F.col("doc_id").cast("long").alias("doc_id")
    ).filter(F.col("doc_id") % DELETE_MOD == DELETE_REM)
    return M.delete_documents(idx, tomb)


def q_delete_bm25(spark, sf):
    """BM25 top-k over a TOMBSTONED index: deleted docs excluded from
    results before top-k, stats (df, N, avg_len) as-built — the oracle
    applies the same exclusion only at the scored stage."""
    return _ranked_e6(Q.bm25_scores(_tombstoned_index(spark, sf), BM25_TERMS), TOP_K)


def q_compact_bm25(spark, sf):
    """BM25 top-k AFTER compact_deletes: physically rewritten postings
    with recomputed stats — must equal an index built on the reduced
    corpus, so the oracle recomputes everything over the filtered
    documents."""
    from peterman_search_engine_spark.operators import maintenance as M

    cidx = M.compact_deletes(_tombstoned_index(spark, sf))
    return _ranked_e6(Q.bm25_scores(cidx, BM25_TERMS), TOP_K)


def q_dedup_exact(spark, sf):
    return DD.dedup_exact(_corpus(spark, sf))


def q_minhash(spark, sf):
    return DD.minhash_signatures(_corpus(spark, sf))


def q_lsh_pairs(spark, sf):
    return DD.lsh_candidate_pairs(_corpus(spark, sf))


def q_lsh_pairs_banded(spark, sf):
    """Banded LSH with r=2 rows per band (2 bands over 4 minhashes):
    the precision knob — a pair must agree on BOTH rows of a band, so
    single-hash collision noise is suppressed vs the r=1 query."""
    return DD.lsh_candidate_pairs(_corpus(spark, sf), rows_per_band=2)


def q_ngram_jaccard(spark, sf):
    docs = _docs(spark, sf).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    return DD.ngram_jaccard_pairs(docs, block_col="source")


def q_simhash(spark, sf):
    return DD.simhash(_corpus(spark, sf))


SAMPLE_RATES = {"src0": 0.25, "src1": 0.5}
DECONTAM_MOD = 53
DECONTAM_MIN_OVERLAP = 2


def q_sample_stratified(spark, sf):
    """Deterministic stratified down-sampling by source
    (`operators/curation.py`): hash(doc_id) < rate per stratum —
    partitioning/retry-invariant and nested across rate changes,
    unlike rand()-based sampling."""
    from peterman_search_engine_spark.operators import curation as CU

    docs = _docs(spark, sf).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    return CU.sample_stratified(docs, "source", SAMPLE_RATES).select(
        "doc_id", "source"
    )


def q_decontaminate(spark, sf):
    """Benchmark decontamination (`operators/curation.py`): flag docs
    sharing >= 2 distinct 3-token shingles with the benchmark set
    (docs with doc_id % 53 == 0 stand in for an eval suite); one
    broadcast shingle join + groupBy."""
    from peterman_search_engine_spark.operators import curation as CU

    docs = _corpus(spark, sf)
    bench = docs.filter(F.col("doc_id") % DECONTAM_MOD == 0)
    return CU.decontaminate(
        docs, bench, min_overlap=DECONTAM_MIN_OVERLAP
    )


def q_dedup_clusters(spark, sf):
    """Near-dup clustering: LSH pairs -> large-star/small-star
    connected components -> (doc_id, cluster_id) for every doc
    (`operators/dedup.py:connected_components`). The canonical-survivor
    step of a dedup pipeline — the reference has no counterpart; the
    DuckDB oracle is a transitive-closure recursive CTE over the same
    pair graph."""
    return DD.dedup_clusters(_corpus(spark, sf))


def _query_vec(spark, sf):
    row = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def q_ann_cosine(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = _query_vec(spark, sf)
    scored = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        SIM.cosine(F.col("embedding"), F.array(*[F.lit(v) for v in qv])).alias("cos"),
    )
    return (
        scored.withColumn("cos_e6", _e6(F.col("cos")))
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def q_ann_lsh(spark, sf):
    """LSH-bucketed ANN in ONE pass: the query's bucket is computed
    driver-side from the deterministic integer planes (no Spark job),
    and bucket assignment + probe filter + exact cosine fuse into a
    single scan of the table."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = _query_vec(spark, sf)
    qb = SIM.query_bucket(qv)
    scored = emb.filter(
        (SIM.bucket_expr(F.col("embedding"), len(qv)) == qb)
        & (F.col("vec_id") != 0)
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        SIM.cosine(F.col("embedding"), F.array(*[F.lit(v) for v in qv])).alias("cos"),
    )
    return (
        scored.withColumn("cos_e6", _e6(F.col("cos")))
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def q_dedup_embedding(spark, sf):
    """Fifth dedup modality: embedding-cosine near-dup via 4-plane
    LSH candidate pairs + exact cosine verification."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return SIM.embedding_neardup_pairs(
        emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding"),
        dim=64,
    )


def _ivf_path(spark, sf):
    """Build the persisted IVF structure once per (session, sf): cell
    assignment is paid at BUILD (like WAND's block_meta), and every
    probe is a partition-pruned scan of the cell directories."""
    import tempfile

    key = ("ivf", id(spark), sf)
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="pse_entry_ivf_")
        emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
            F.col("vec_id").cast("long").alias("vec_id"), "embedding"
        )
        SIM.build_ivf(emb, d, n_cells=16)
        _INDEX_CACHE[key] = d
    return _INDEX_CACHE[key]


def q_ann_ivf(spark, sf):
    """IVF ANN over the PERSISTED structure (similarity.build_ivf +
    ivf_topk_persisted): deterministic 16-centroid codebook ranked
    driver-side, then ONE scan of the 2 probed cell partitions
    (PartitionFilters prune the rest — the cell assignment crossJoin
    is paid once at build, never per query)."""
    qv = _query_vec(spark, sf)
    scored = SIM.ivf_topk_persisted(
        spark, _ivf_path(spark, sf), qv, k=TOP_K, n_probe=2, exclude_ids=[0]
    )
    return (
        scored.withColumn("cos_e6", _e6(F.col("cos")))
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def q_token_counts(spark, sf):
    return _corpus(spark, sf).select(
        "doc_id",
        TS.ws_token_count(F.col("text")).cast("long").alias("ws_tokens"),
        TS.bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


def q_quality(spark, sf):
    return _corpus(spark, sf).select(
        "doc_id", _e6(TS.quality_score(F.col("text"))).alias("quality_e6")
    )


def q_lang_id(spark, sf):
    return _corpus(spark, sf).select(
        "doc_id", TS.lang_id(F.col("text")).alias("predicted_lang")
    )


def q_fingerprint(spark, sf):
    toks = _corpus(spark, sf).select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("pos", "term")
    )
    return toks.groupBy("doc_id").agg(
        (F.sum(TS.fingerprint_term(F.col("pos"), F.col("term"))) % TS.FP_MOD)
        .cast("long")
        .alias("fp")
    )


def q_multimodal(spark, sf):
    media = attach_fake_media(_corpus(spark, sf))
    return extract_features(media)


def q_multimodal_frames(spark, sf):
    """Video frame-sampling plumbing (one row -> many frame rows via
    mapInPandas), verified by accounting: per-doc frame count and total
    frame bytes reconstruct the payload size."""
    from peterman_search_engine_spark.operators.multimodal import (
        attach_fake_media,
        sample_frames,
    )

    frames = sample_frames(attach_fake_media(_corpus(spark, sf)), every_n_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.length("frame")).alias("total_bytes"),
    )


def q_events_window(spark, sf):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        _e6(F.sum("value")).alias("sum_value_e6"),
    )


def q_streaming_events_hourly(spark, sf):
    """True Structured Streaming path: readStream over the events
    parquet -> 10-minute watermark -> tumbling 1h event-time window ->
    stateful count/sum -> availableNow trigger draining to a memory
    sink. With a static input the watermark drops nothing, so the
    result must equal the batch hourly aggregation — same SQL oracle
    as events_hourly."""
    import os
    import tempfile
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    static = spark.read.parquet(f"{sf}/events.parquet")
    # the file stream source requires a DIRECTORY; stage the single
    # parquet file behind a symlink dir
    src_dir = tempfile.mkdtemp(prefix="pse_stream_events_src_")
    os.symlink(f"{sf}/events.parquet", os.path.join(src_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # watermarks require TIMESTAMP (the parquet column is NTZ; with the
    # session in UTC the cast is wall-clock identity)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _e6(F.sum("value")).alias("sum_value_e6"),
        )
    )
    name = "pse_stream_events_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="pse_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.floor(F.unix_timestamp(F.col("window.start")) / 3600)
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
        "n_events",
        "sum_value_e6",
    )


PR_WEIGHT = 0.5


def q_combined_rank(spark, sf):
    """Q16: TF-IDF over all matches + PR_WEIGHT x PageRank, top-k."""
    from peterman_search_engine_spark.operators.pagerank import combined_search

    idx = _index(spark, sf)
    scored = Q.tfidf_scores(idx, TFIDF_TERMS)
    n = _docs(spark, sf).count()
    ranks = pagerank(generate_edges(spark, n), PR_ITERS)
    comb = combined_search(scored, ranks, pr_weight=PR_WEIGHT, top_k=None)
    return _ranked_e6(comb, TOP_K)


def q_pagerank(spark, sf):
    n = _docs(spark, sf).count()
    edges = generate_edges(spark, n)
    pr = pagerank(edges, PR_ITERS)
    return pr.select(
        F.col("node").cast("long").alias("node"), _e6(F.col("pr")).alias("pr_e6")
    )


# -- round-3 query/analysis operators ------------------------------------------

FUZZY_TERM = "vectr"          # 1 edit from "vector"
FUZZY_DIST = 1
WILDCARD = "s*a*"             # scan, small, spark, stream
SUGGEST_PREFIX = "s"
GROUP_TERMS = OR_TERMS        # rank sources by summed member BM25
GROUP_K = 5
MLT_DOC = 7
MLT_TERMS = 8
PMI_MIN_COUNT = 5
PMI_K = 20


def q_fuzzy(spark, sf):
    """Typo-tolerant search: dictionary terms within levenshtein<=1."""
    return Q.search_fuzzy(_index(spark, sf), FUZZY_TERM, FUZZY_DIST)


def q_wildcard(spark, sf):
    """Wildcard term search over the dictionary (s*a*)."""
    return Q.search_wildcard(_index(spark, sf), WILDCARD)


def q_suggest(spark, sf):
    """Autocomplete: top dictionary terms under a prefix by df."""
    return Q.suggest_terms(_index(spark, sf), SUGGEST_PREFIX, TOP_K)


def q_bm25f(spark, sf):
    """Weighted-field BM25 (head = first 16 analyzed positions)."""
    from peterman_search_engine_spark.operators.ranking import bm25f_scores

    return _ranked_e6(bm25f_scores(_index(spark, sf), BM25_TERMS), TOP_K)


def q_grouped_rank(spark, sf):
    """Group-level retrieval: sources ranked by summed member BM25."""
    from peterman_search_engine_spark.operators.ranking import grouped_topk

    g = grouped_topk(
        _index(spark, sf), GROUP_TERMS, _docs(spark, sf), "source", None
    )
    return (
        g.select(
            F.col("group").alias("grp"),
            "n_docs",
            _e6(F.col("score")).alias("score_e6"),
        )
        .orderBy(F.desc("score_e6"), F.asc("grp"))
        .limit(GROUP_K)
    )


def q_more_like_this(spark, sf):
    """Query-by-example: BM25 over the example doc's top tf*idf terms."""
    from peterman_search_engine_spark.operators.ranking import more_like_this

    mlt = more_like_this(
        _index(spark, sf), _corpus(spark, sf), MLT_DOC,
        max_terms=MLT_TERMS, top_k=None,
    )
    return _ranked_e6(mlt, TOP_K)


def q_bigram_pmi(spark, sf):
    """Collocations: top-k adjacent analyzed bigrams by PMI."""
    from peterman_search_engine_spark.operators.collocations import bigram_pmi

    b = bigram_pmi(
        _corpus(spark, sf), min_count=PMI_MIN_COUNT, top_k=None, stem=False
    )
    return (
        b.select("w1", "w2", "n", _e6(F.col("pmi")).alias("pmi_e6"))
        .orderBy(F.desc("pmi_e6"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_K)
    )


BOOL_QUERY = '(spark AND merge) OR ("fast table" AND NOT stream) OR wind*'


def q_boolean(spark, sf):
    """Boolean query-string surface: one parse rendered as both the
    Spark set-algebra plan and the SQL oracle."""
    from peterman_search_engine_spark.operators.boolparser import search_boolean

    return search_boolean(_index(spark, sf), BOOL_QUERY)


def q_redact(spark, sf):
    """PII scrub of doc_id-augmented text; portable md5 of the result."""
    from peterman_search_engine_spark.functions.textstats import md5_long, redact_pii

    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-867-5309"),
    )
    return _docs(spark, sf).select(
        "doc_id", md5_long(redact_pii(aug)).alias("red_hash")
    )


BATCH_QUERIES = {
    0: ["spark", "merge"],
    1: ["vector"],
    2: ["stream", "window", "join"],
    3: ["fast", "table"],
    4: ["customer", "order"],
    5: ["query", "data", "data"],
}
BATCH_K = 5


def q_batch_bm25(spark, sf):
    """A whole query log ranked in ONE plan: shared posting scan,
    broadcast fan-out across queries, per-qid window top-k."""
    from peterman_search_engine_spark.operators.batch import batch_bm25_topk

    return batch_bm25_topk(
        _index(spark, sf), BATCH_QUERIES, BATCH_K, rank_e6=True
    )


SESSION_GAP_MIN = 360


def q_sessionize(spark, sf):
    """Custom stateful streaming: gap-timeout sessionization via
    applyInPandasWithState, sessions spanning micro-batches; oracle is
    the relational gaps-and-islands rewrite."""
    from peterman_search_engine_spark.streaming.sessionize import sessionize_events

    return sessionize_events(
        spark, f"{sf}/events.parquet", gap_minutes=SESSION_GAP_MIN, n_batches=2
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 on sf0.001; driver checks rows>0."""
    return q_bm25(spark, "/root/testdata/sf0.001")


REGEX_PAT = "(merg|wind)[a-z]*"


def q_lm_dirichlet(spark, sf):
    """LM-Dirichlet query-likelihood ranking (ranking.py) — the third
    ranking family beside TF-IDF (IIM:614-650) and BM25."""
    return _ranked_e6(RK.lm_dirichlet_scores(_index(spark, sf), BM25_TERMS), TOP_K)


def q_hybrid_rrf(spark, sf):
    """Hybrid lexical+vector retrieval: RRF fusion of BM25 top-50 and
    cosine top-50 (the embeddings table is keyed by the same id space
    in this corpus: vec_id ≡ doc key)."""
    idx = _index(spark, sf)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = _query_vec(spark, sf)
    return RK.hybrid_rrf_topk(
        idx, emb, BM25_TERMS, qv, k=TOP_K, n_each=50, exclude_ids=[0]
    )


def q_regex(spark, sf):
    """Dictionary regex search (Lucene RegexpQuery shape)."""
    return Q.search_regex(_index(spark, sf), REGEX_PAT, TOP_K)


QUALITY_MIN_E6 = 500_000
LSH_PROBE_RADIUS = 3


def q_bm25_page2(spark, sf):
    """Keyset pagination (query.search_bm25_page): page 2 of the BM25
    ranking. The cursor is page 1's last (score_e6, doc_id) — O(k)
    client-side state, exactly what a search API hands back."""
    idx = _index(spark, sf)
    page1 = Q.search_bm25_page(idx, BM25_TERMS, TOP_K).collect()
    cur = (page1[-1]["score_e6"], page1[-1]["doc_id"])
    return Q.search_bm25_page(idx, BM25_TERMS, TOP_K, cursor=cur)


def q_rank_eval(spark, sf):
    """TREC-style eval harness (operators/evaluation.rank_eval): MRR +
    binary nDCG@10 of the batch-BM25 run against conjunctive-
    containment qrels."""
    from pyspark.sql.window import Window

    from peterman_search_engine_spark.operators.batch import batch_bm25_topk
    from peterman_search_engine_spark.operators.evaluation import (
        and_qrels,
        rank_eval,
    )

    idx = _index(spark, sf)
    runs = batch_bm25_topk(idx, BATCH_QUERIES, TOP_K, rank_e6=True)
    w = Window.partitionBy("qid").orderBy(F.desc("score_e6"), F.asc("doc_id"))
    runs = runs.withColumn("rank", F.row_number().over(w))
    return rank_eval(runs, and_qrels(idx, BATCH_QUERIES), k=TOP_K)


def q_ann_lsh_multiprobe(spark, sf):
    """Multi-probe LSH ANN (similarity.lsh_multiprobe_topk): one scan
    with bit_count(bucket XOR q) <= radius as the probe filter — the
    recall-vs-scanned-fraction knob single-bucket LSH lacks."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = _query_vec(spark, sf)
    qb = SIM.query_bucket(qv)
    scored = emb.filter(
        (
            F.bit_count(
                SIM.bucket_expr(F.col("embedding"), len(qv)).bitwiseXOR(F.lit(qb))
            )
            <= F.lit(LSH_PROBE_RADIUS)
        )
        & (F.col("vec_id") != 0)
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        SIM.cosine(F.col("embedding"), F.array(*[F.lit(v) for v in qv])).alias("cos"),
    )
    return (
        scored.withColumn("cos_e6", _e6(F.col("cos")))
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(TOP_K)
    )


SPAN_TERMS = ["fast", "table"]
SPAN_GAP = 3
SPELL_TERM = "sparc"
SPELL_DIST = 2
SPELL_K = 5
PRF_FB_DOCS = 5
PRF_FB_TERMS = 5
PRF_EXP_WEIGHT = 0.5
UPSERT_MOD = 97
UPSERT_SUFFIX = " zz7upd spark"
UPSERT_TERMS = ["spark", "zz7upd"]


def q_span_near(spark, sf):
    """Ordered span-near (query.search_span_near, the Lucene
    SpanNearQuery inOrder shape): terms in order, each consecutive
    pair within SPAN_GAP positions — gap 1 would be the strict
    phrase."""
    return Q.search_span_near(_index(spark, sf), SPAN_TERMS, SPAN_GAP)


def q_spell_correct(spark, sf):
    """Did-you-mean (query.suggest_spelling): dictionary terms within
    edit distance SPELL_DIST of a misspelling, (dist asc, df desc,
    term asc) — one metadata-dictionary scan, postings untouched."""
    return Q.suggest_spelling(
        _index(spark, sf), SPELL_TERM, max_dist=SPELL_DIST, top_k=SPELL_K
    )


def _spell_index(spark, sf):
    """Persisted deletion-neighborhood dictionary expansion, built once
    per (session, sf): variants partitioned by a driver-computable md5
    bucket so a query prunes to its variants' partitions."""
    import tempfile

    from peterman_search_engine_spark.operators import spell as SPELL

    key = ("spell", id(spark), sf)
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="pse_entry_spell_")
        _INDEX_CACHE[key] = SPELL.build_spell_index(
            _index(spark, sf), max_dist=SPELL_DIST, out_dir=d
        )
    return _INDEX_CACHE[key]


def q_spell_correct_indexed(spark, sf):
    """Did-you-mean served from the SymSpell deletion-neighborhood
    index (operators/spell.py) instead of a full dictionary scan: the
    misspelling's own deletion variants prune the lookup to
    ``bucket IN`` partitions + ``variant IN`` pushdown, then an exact
    levenshtein verify restores the precise contract — same oracle as
    spell_correct (the full-scan form)."""
    from peterman_search_engine_spark.operators import spell as SPELL

    return SPELL.suggest_spelling_indexed(
        _spell_index(spark, sf), SPELL_TERM,
        max_dist=SPELL_DIST, top_k=SPELL_K,
    )


def q_fuzzy_indexed(spark, sf):
    """Typo-tolerant search with the dictionary expansion served from
    the deletion-neighborhood index — same results and oracle as
    fuzzy_search (the full-scan form)."""
    from peterman_search_engine_spark.operators import spell as SPELL

    return SPELL.search_fuzzy_indexed(
        _index(spark, sf), _spell_index(spark, sf), FUZZY_TERM, FUZZY_DIST
    )


def q_prf_bm25(spark, sf):
    """RM3 pseudo-relevance feedback (ranking.search_rm3): BM25 top-5
    docs feed 5 expansion terms (exact-integer strength tf*score_e6),
    re-ranked with the expanded weighted query."""
    import peterman_search_engine_spark.operators.ranking as RKm

    scored = RKm.search_rm3(
        _index(spark, sf), _corpus(spark, sf), BM25_TERMS,
        fb_docs=PRF_FB_DOCS, fb_terms=PRF_FB_TERMS,
        exp_weight=PRF_EXP_WEIGHT, top_k=None,
    )
    return _ranked_e6(scored, TOP_K)


def q_upsert_bm25(spark, sf):
    """Upsert-reindex (maintenance.upsert_documents): docs with
    doc_id % UPSERT_MOD == 0 get new text appended; the upserted index
    must rank exactly like a fresh build on the updated corpus — the
    query includes the marker term only the new versions contain."""
    from peterman_search_engine_spark.operators.maintenance import (
        upsert_documents,
    )

    key = ("upsert", id(spark), sf)
    if key not in _INDEX_CACHE:
        updated = (
            _corpus(spark, sf)
            .filter(F.col("doc_id") % UPSERT_MOD == 0)
            .withColumn("text", F.concat(F.col("text"), F.lit(UPSERT_SUFFIX)))
        )
        idx = upsert_documents(_index(spark, sf), updated, docs_per_segment=200)
        idx.postings = idx.postings.localCheckpoint(eager=True)
        idx.doc_stats = idx.doc_stats.localCheckpoint(eager=True)
        idx.term_stats = idx.term_stats.localCheckpoint(eager=True)
        _INDEX_CACHE[key] = idx
    return _ranked_e6(Q.bm25_scores(_INDEX_CACHE[key], UPSERT_TERMS), TOP_K)


def q_streaming_upsert_bm25(spark, sf):
    """Streaming upserts (incremental.ingest_batch upsert=True): batch
    0 ingests the whole corpus as conversations, batch 1 RE-SENDS the
    docs with doc_id % UPSERT_MOD == 0 carrying UPSERT_SUFFIX — the
    re-sent conv_ids supersede their old turns via the bucket-pruned
    conv→doc map probe + tombstones, and after reencode_blocks
    (physical compaction) the index must rank exactly like a fresh
    build on the updated corpus: same oracle as upsert_bm25_topk (the
    batch maintenance.upsert_documents form). Internal doc_ids map
    back to table ids through the conv→doc map the upsert maintains."""
    import tempfile

    from peterman_search_engine_spark.streaming.incremental import (
        ingest_batch,
        load_streaming_index,
        reencode_blocks,
    )

    key = ("stream_upsert", id(spark), sf)
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="pse_entry_supsert_")
        docs = _docs(spark, sf).select(
            F.format_string("c%09d", F.col("doc_id").cast("long")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            "text",
            F.col("doc_id").cast("long").alias("_id"),
        )
        ingest_batch(docs.drop("_id"), d, 0, stem=False, docs_per_segment=200)
        upd = docs.filter(F.col("_id") % UPSERT_MOD == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit(UPSERT_SUFFIX))
        )
        ingest_batch(upd.drop("_id"), d, 1, stem=False, docs_per_segment=200)
        reencode_blocks(spark, d)
        idx = load_streaming_index(spark, d)
        idx.postings = idx.postings.localCheckpoint(eager=True)
        idx.doc_stats = idx.doc_stats.localCheckpoint(eager=True)
        idx.term_stats = idx.term_stats.localCheckpoint(eager=True)
        dm = (
            spark.read.option("basePath", f"{d}/doc_map")
            .parquet(f"{d}/doc_map")
            .select(
                "doc_id",
                F.expr("cast(substring(conv_id, 2, 18) as long)").alias("_orig"),
            )
            .localCheckpoint(eager=True)
        )
        _INDEX_CACHE[key] = (idx, dm)
    idx, dm = _INDEX_CACHE[key]
    remapped = (
        Q.bm25_scores(idx, UPSERT_TERMS)
        .join(dm, "doc_id")
        .select(F.col("_orig").alias("doc_id"), "score")
    )
    return _ranked_e6(remapped, TOP_K)


LSH_ENUM_RADIUS = 1


def _lsh_path(spark, sf):
    """Build the persisted LSH structure once per (session, sf):
    vectors partitioned by their 8-plane bucket, so a radius-r probe
    reads only the C(8, <=r) matching directories."""
    import tempfile

    key = ("lsh", id(spark), sf)
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="pse_entry_lsh_")
        emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
            F.col("vec_id").cast("long").alias("vec_id"), "embedding"
        )
        SIM.build_lsh(emb, d, dim=64)
        _INDEX_CACHE[key] = d
    return _INDEX_CACHE[key]


def q_ann_lsh_enumerated(spark, sf):
    """Multi-probe LSH via BUCKET-ID ENUMERATION over bucket-partitioned
    storage (similarity.build_lsh + lsh_multiprobe_persisted): the
    C(8, <=1) = 9 probe bucket ids are enumerated driver-side and the
    scan partition-prunes to those directories — vs the scan-filter
    form (ann_lsh_multiprobe) that reads every row to evaluate
    bit_count. The oracle is the Hamming-distance formulation, so the
    enumeration itself is under the value-hash gate."""
    qv = _query_vec(spark, sf)
    scored = SIM.lsh_multiprobe_persisted(
        spark, _lsh_path(spark, sf), qv,
        k=TOP_K, radius=LSH_ENUM_RADIUS, exclude_ids=[0],
    )
    return (
        scored.withColumn("cos_e6", _e6(F.col("cos")))
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def q_curation_pipeline(spark, sf):
    """End-to-end curation as ONE plan (curation.curation_pipeline):
    exact dedup -> quality floor -> decontamination vs the doc_id%53
    stand-in benchmark -> deterministic stratified sample."""
    from peterman_search_engine_spark.operators import curation as CU

    docs = _docs(spark, sf).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    bench = docs.filter(F.col("doc_id") % DECONTAM_MOD == 0)
    return CU.curation_pipeline(
        docs,
        bench,
        strata_col="source",
        rates=SAMPLE_RATES,
        quality_min_e6=QUALITY_MIN_E6,
        min_overlap=DECONTAM_MIN_OVERLAP,
    )


def q_text_repetition(spark, sf):
    """Gopher-style repetition quality signals (textstats.py)."""
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        _e6(TS.dup_word_fraction(F.col("text"))).alias("dup_word_e6"),
        _e6(TS.dup_bigram_fraction(F.col("text"))).alias("dup_bigram_e6"),
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "and_search": q_and,
        "keyword_search": q_keyword,
        "doc_iterator": q_doc_iterator,
        "full_scan_search": q_full_scan,
        "or_search": q_or,
        "phrase_search": q_phrase,
        "proximity_search": q_proximity,
        "not_search": q_not,
        "prefix_search": q_prefix,
        "bm25_topk_filtered": q_bm25_filtered,
        "snippets": q_snippets,
        "facet_counts": q_facets,
        "phrase_search_compressed": q_phrase_compressed,
        "bm25_topk": q_bm25,
        "cold_bm25_topk": q_bm25_cold,
        "bm25_topk_stemmed": q_bm25_stemmed,
        "bm25_wand_topk": q_bm25_wand,
        "bm25_wand_forced": q_bm25_wand_forced,
        "streaming_bm25_topk": q_streaming_bm25,
        "streaming_events_hourly": q_streaming_events_hourly,
        "wordbreak_tokens": q_wordbreak,
        "tfidf_topk": q_tfidf,
        "term_stats": q_term_stats,
        "merged_postings": q_merged_postings,
        "doc_stats": q_doc_stats,
        "postings_dump": q_postings,
        "posting_compression": q_compressed_size,
        "delete_bm25_topk": q_delete_bm25,
        "compact_bm25_topk": q_compact_bm25,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_minhash,
        "dedup_lsh_pairs": q_lsh_pairs,
        "dedup_lsh_banded": q_lsh_pairs_banded,
        "dedup_clusters": q_dedup_clusters,
        "sample_stratified": q_sample_stratified,
        "decontaminate": q_decontaminate,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_simhash": q_simhash,
        "dedup_embedding": q_dedup_embedding,
        "ann_cosine_topk": q_ann_cosine,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "text_token_counts": q_token_counts,
        "text_quality": q_quality,
        "text_lang_id": q_lang_id,
        "text_fingerprint": q_fingerprint,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_features": q_multimodal,
        "events_hourly": q_events_window,
        "pagerank": q_pagerank,
        "combined_rank": q_combined_rank,
        "fuzzy_search": q_fuzzy,
        "wildcard_search": q_wildcard,
        "suggest_terms": q_suggest,
        "bm25f_topk": q_bm25f,
        "grouped_rank": q_grouped_rank,
        "more_like_this": q_more_like_this,
        "bigram_pmi": q_bigram_pmi,
        "text_redact": q_redact,
        "boolean_query": q_boolean,
        "batch_bm25_topk": q_batch_bm25,
        "streaming_sessionize": q_sessionize,
        "lm_dirichlet_topk": q_lm_dirichlet,
        "hybrid_rrf_topk": q_hybrid_rrf,
        "regex_search": q_regex,
        "text_repetition": q_text_repetition,
        "curation_pipeline": q_curation_pipeline,
        "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "ann_lsh_enumerated": q_ann_lsh_enumerated,
        "span_near_search": q_span_near,
        "spell_correct": q_spell_correct,
        "spell_correct_indexed": q_spell_correct_indexed,
        "fuzzy_search_indexed": q_fuzzy_indexed,
        "prf_bm25_topk": q_prf_bm25,
        "upsert_bm25_topk": q_upsert_bm25,
        "streaming_upsert_bm25": q_streaming_upsert_bm25,
        "bm25_page2": q_bm25_page2,
        "rank_eval": q_rank_eval,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "and_search": S.sql_and(AND_TERMS),
        "keyword_search": S.sql_keyword(KEYWORD),
        "doc_iterator": S.sql_doc_iterator(),
        "full_scan_search": S.sql_full_scan(AND_TERMS),
        "or_search": S.sql_or(OR_TERMS),
        "phrase_search": S.sql_phrase(PHRASE),
        "proximity_search": S.sql_proximity(PROX_TERMS, PROX_SLOP),
        "not_search": S.sql_and_not(NOT_INCLUDE, NOT_EXCLUDE),
        "prefix_search": S.sql_prefix(PREFIX),
        "bm25_topk_filtered": S.sql_bm25(
            BM25_TERMS,
            TOP_K,
            result_where=(
                "tf.doc_id IN (SELECT doc_id FROM documents"
                f" WHERE lang = '{FILTER_LANG}')"
            ),
        ),
        "snippets": S.sql_snippets(AND_TERMS, AND_TERMS, SNIP_WIDTH),
        "facet_counts": S.sql_facets(OR_TERMS, FACET_COL),
        "phrase_search_compressed": S.sql_phrase(PHRASE),
        "bm25_topk": S.sql_bm25(BM25_TERMS, TOP_K),
        "cold_bm25_topk": S.sql_bm25(BM25_TERMS, TOP_K),
        # A3/A4 gate: the oracle reads a stemmed-token fixture built by
        # the shared pure-Python analyzer (DuckDB has no offline
        # stemmer); generated for the sf dir the driver compares at
        # (override with PSE_TEST_SF_DIR)
        "bm25_topk_stemmed": S.sql_bm25_stemmed(
            BM25_TERMS,
            TOP_K,
            S.ensure_stemmed_fixture(
                __import__("os").environ.get(
                    "PSE_TEST_SF_DIR", "/root/testdata/sf0.01"
                )
            ),
        ),
        "bm25_wand_topk": S.sql_bm25(BM25_TERMS, TOP_K),
        "bm25_wand_forced": S.sql_bm25(BM25_TERMS, TOP_K),
        # streaming incremental build is rank-identical to batch: same
        # oracle as bm25_topk. (wordbreak_tokens intentionally has no
        # oracle: DP segmentation is not expressible in portable SQL.)
        "streaming_bm25_topk": S.sql_bm25(BM25_TERMS, TOP_K),
        # watermarked windowed streaming agg over a static input drops
        # nothing: identical to the batch hourly rollup
        "streaming_events_hourly": S.sql_events_window(),
        "tfidf_topk": S.sql_tfidf(TFIDF_TERMS, TOP_K),
        "term_stats": S.sql_term_stats(50),
        "merged_postings": S.sql_postings(POSTING_TERMS),
        "doc_stats": S.sql_doc_stats(),
        "postings_dump": S.sql_postings(POSTING_TERMS),
        "posting_compression": S.sql_compressed_size(50),
        "delete_bm25_topk": S.sql_bm25(
            BM25_TERMS,
            TOP_K,
            result_where=f"tf.doc_id % {DELETE_MOD} <> {DELETE_REM}",
        ),
        "compact_bm25_topk": S.sql_bm25(
            BM25_TERMS,
            TOP_K,
            docs_where=f"doc_id % {DELETE_MOD} <> {DELETE_REM}",
        ),
        "dedup_exact": S.sql_dedup_exact(),
        "dedup_minhash": S.sql_minhash(),
        "dedup_lsh_pairs": S.sql_lsh_pairs(),
        "dedup_lsh_banded": S.sql_lsh_pairs(rows_per_band=2),
        "dedup_clusters": S.sql_dedup_clusters(),
        "sample_stratified": S.sql_sample_stratified(
            SAMPLE_RATES, 1.0, "pse-sample"
        ),
        "decontaminate": S.sql_decontaminate(
            DECONTAM_MOD, DECONTAM_MIN_OVERLAP
        ),
        "dedup_ngram_jaccard": S.sql_ngram_jaccard("source"),
        "dedup_simhash": S.sql_simhash(),
        "dedup_embedding": S.sql_embedding_neardup(),
        "ann_cosine_topk": S.sql_ann_cosine(TOP_K),
        "ann_lsh_topk": S.sql_ann_lsh(TOP_K),
        "ann_ivf_topk": S.sql_ann_ivf(TOP_K),
        "text_token_counts": S.sql_token_counts(),
        "text_quality": S.sql_quality(),
        "text_lang_id": S.sql_lang_id(),
        "text_fingerprint": S.sql_fingerprint(),
        "multimodal_frames": S.sql_multimodal_frames(),
        "multimodal_features": S.sql_multimodal(),
        "events_hourly": S.sql_events_window(),
        "pagerank": S.sql_pagerank(PR_ITERS),
        "combined_rank": S.sql_combined_rank(TFIDF_TERMS, TOP_K, PR_ITERS, PR_WEIGHT),
        "fuzzy_search": S.sql_fuzzy(FUZZY_TERM, FUZZY_DIST),
        "wildcard_search": S.sql_wildcard(WILDCARD),
        "suggest_terms": S.sql_suggest(SUGGEST_PREFIX, TOP_K),
        "bm25f_topk": S.sql_bm25f(
            BM25_TERMS, TOP_K,
            head_len=RK.HEAD_LEN, w_head=RK.W_HEAD, w_body=RK.W_BODY,
        ),
        "grouped_rank": S.sql_grouped(GROUP_TERMS, "source", GROUP_K),
        "more_like_this": S.sql_more_like_this(MLT_DOC, MLT_TERMS, TOP_K),
        "bigram_pmi": S.sql_bigram_pmi(PMI_MIN_COUNT, PMI_K),
        "text_redact": S.sql_redact(TS.EMAIL_RE, TS.PHONE_RE),
        "boolean_query": S.sql_boolean(BOOL_QUERY),
        "batch_bm25_topk": S.sql_batch_bm25(BATCH_QUERIES, BATCH_K),
        "streaming_sessionize": S.sql_sessionize(SESSION_GAP_MIN),
        "lm_dirichlet_topk": S.sql_lm_dirichlet(BM25_TERMS, TOP_K),
        "hybrid_rrf_topk": S.sql_hybrid_rrf(BM25_TERMS, TOP_K),
        "regex_search": S.sql_regex(REGEX_PAT, TOP_K),
        "text_repetition": S.sql_repetition(),
        "curation_pipeline": S.sql_curation_pipeline(
            SAMPLE_RATES, 1.0, "pse-sample", QUALITY_MIN_E6,
            DECONTAM_MOD, DECONTAM_MIN_OVERLAP,
        ),
        "ann_lsh_multiprobe": S.sql_ann_lsh_multiprobe(
            TOP_K, radius=LSH_PROBE_RADIUS
        ),
        "ann_lsh_enumerated": S.sql_ann_lsh_multiprobe(
            TOP_K, radius=LSH_ENUM_RADIUS
        ),
        "span_near_search": S.sql_span_near(SPAN_TERMS, SPAN_GAP),
        "spell_correct": S.sql_spell_correct(SPELL_TERM, SPELL_DIST, SPELL_K),
        "spell_correct_indexed": S.sql_spell_correct(
            SPELL_TERM, SPELL_DIST, SPELL_K
        ),
        "fuzzy_search_indexed": S.sql_fuzzy(FUZZY_TERM, FUZZY_DIST),
        "prf_bm25_topk": S.sql_rm3(
            BM25_TERMS, TOP_K, fb_docs=PRF_FB_DOCS, fb_terms=PRF_FB_TERMS,
            exp_weight=PRF_EXP_WEIGHT,
        ),
        "upsert_bm25_topk": S.sql_upsert_bm25(
            UPSERT_TERMS, TOP_K, UPSERT_MOD, UPSERT_SUFFIX
        ),
        "streaming_upsert_bm25": S.sql_upsert_bm25(
            UPSERT_TERMS, TOP_K, UPSERT_MOD, UPSERT_SUFFIX
        ),
        "bm25_page2": S.sql_bm25_page2(BM25_TERMS, TOP_K),
        "rank_eval": S.sql_rank_eval(BATCH_QUERIES, TOP_K),
    }
