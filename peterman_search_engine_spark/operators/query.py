"""Query operators — SURVEY.md §2.3 (Q1-Q13, Q17).

Every query is a declarative DataFrame plan over the index tables:

* query terms (tiny) join the postings via an IN-filter — Parquet
  predicate pushdown prunes files by the ``term`` column, the
  Spark-side analogue of the reference's per-segment dictionary skip
  (``InvertedIndexManager.java:390, 617``).
* doc-level aggregation is a hash aggregate (Catalyst partial+final —
  exactly the reference's per-segment accumulator maps, ``IIM:614-638``,
  but distributed).
* top-k is ``orderBy(desc(score), doc_id).limit(k)`` →
  ``TakeOrderedAndProject`` (per-partition bounded heap + driver merge;
  the distributed form of the reference's MinMaxPriorityQueue,
  ``IIM:574-582``). Tiebreak is the canonical (-score, doc_id) (§2.4).
* block-max WAND (north-star addition) prunes posting blocks whose
  stored upper bound cannot beat the running k-th score — implemented
  in ``wand.py`` as an applyInPandas over per-segment posting groups.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import analyze_query
from .indexer import B, K1, InvertedIndex


def _analyzed(index: InvertedIndex, terms: list[str]) -> list[str]:
    return analyze_query(terms, stem=index.stem)


def _postings_for(index: InvertedIndex, toks: list[str]) -> DataFrame:
    """Postings restricted to the query terms. The isin filter pushes
    down to the Parquet scan of a persisted index."""
    return index.postings.filter(F.col("term").isin(list(set(toks))))


def _live(index: InvertedIndex, df: DataFrame) -> DataFrame:
    """Drop tombstoned docs from a (doc_id, ...) result. Anti-join on
    the metadata-sized tombstone table (broadcast under AQE for the
    typical sparse-delete case); no-op when the index has no deletes.
    Ranked queries apply this BEFORE top-k so deleted docs can't
    occupy result slots; stats (df, N, avg_len) intentionally stay
    as-built until compact_deletes (operators/maintenance.py)."""
    if index.tombstones is None:
        return df
    return df.join(index.tombstones, "doc_id", "left_anti")


# -- Q1-Q3: keyword / AND / OR ------------------------------------------------

def search_and(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Q2 (and Q1 with one term): docs containing ALL analyzed terms.
    Set-intersection (IIM:1156-1157) as a count-matching semi-join:
    explode postings for the q terms, count distinct matched terms per
    doc, keep docs matching all. Returns (doc_id)."""
    toks = sorted(set(_analyzed(index, terms)))
    spark = index.postings.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long")
    p = _postings_for(index, toks)
    hits = p.select("term", F.explode("doc_ids").alias("doc_id"))
    return _live(
        index,
        hits.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("_n"))
        .filter(F.col("_n") == len(toks))
        .select("doc_id"),
    )


def search_keyword(index: InvertedIndex, keyword: str) -> DataFrame:
    """Q1: analyze the keyword (may produce several tokens) and AND
    them; empty/blank string -> empty result (IIM:305-307)."""
    if not keyword.strip():
        return index.postings.sparkSession.createDataFrame([], "doc_id long")
    return search_and(index, [keyword])


def search_or(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Q3: docs containing ANY analyzed term (IIM:1158-1159)."""
    toks = sorted(set(_analyzed(index, terms)))
    spark = index.postings.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long")
    p = _postings_for(index, toks)
    return _live(index, p.select(F.explode("doc_ids").alias("doc_id")).distinct())


def search_and_not(
    index: InvertedIndex, include: list[str], exclude: list[str]
) -> DataFrame:
    """Boolean NOT (beyond-reference — the reference's boolean algebra
    stops at AND/OR, IIM:1156-1159): docs containing ALL include terms
    and NONE of the exclude terms.

    Plan: AND semi-join for the include side, anti-join against the
    exclude terms' doc set. Both sides are term-IN-filtered posting
    scans (parquet-pruned); the anti-join shuffles on doc_id and AQE
    broadcasts the exclude side when it is small. Returns (doc_id)."""
    inc = search_and(index, include)
    etoks = sorted(set(_analyzed(index, exclude)))
    if not etoks:
        return inc
    ep = _postings_for(index, etoks)
    edocs = ep.select(F.explode("doc_ids").alias("doc_id")).distinct()
    return inc.join(edocs, "doc_id", "left_anti")


def search_prefix(index: InvertedIndex, prefix: str) -> DataFrame:
    """Wildcard ``prefix*`` search (beyond-reference): docs containing
    ANY dictionary term starting with the prefix.

    The prefix is lowercased but NOT stemmed — stemming rewrites
    suffixes, which is exactly what a prefix query must leave open.
    LIMITATION on a ``stem=True`` index: the dictionary stores STEMS,
    so a surface-form prefix longer than a term's stem silently
    misses docs (``"running"`` never matches the stored ``"run"``).
    Prefix search is exact only on unstemmed indexes; on stemmed
    indexes it matches stem prefixes — callers who need surface-form
    prefixes should keep an unstemmed index (or an extra surface-term
    column) alongside.
    ``startswith`` compiles to a StringStartsWith filter that pushes
    into the parquet scan of a persisted index; because the on-disk
    layout sorts rows by term inside each segment file, row-group
    min/max term statistics turn this into a dictionary *range scan*
    (the reference's sorted in-memory dictionary would serve the same
    query with a bisect, but never implements it). Returns (doc_id)."""
    pfx = prefix.strip().lower()
    spark = index.postings.sparkSession
    if not pfx:
        return spark.createDataFrame([], "doc_id long")
    p = index.postings.filter(F.col("term").startswith(pfx))
    return _live(index, p.select(F.explode("doc_ids").alias("doc_id")).distinct())


def _docs_for_terms(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Distinct live docs containing ANY of the (already-analyzed)
    terms — the shared tail of every dictionary-expansion query."""
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    p = _postings_for(index, terms)
    return _live(index, p.select(F.explode("doc_ids").alias("doc_id")).distinct())


# Ceiling on how many matched dictionary terms an expansion query may
# bring to the driver. Below it, the IN-filtered plan keeps parquet
# predicate pushdown on the posting scan; above it (adversarial
# patterns like ``*e*`` that match half the dictionary), the SAME
# predicate moves onto the posting scan itself and the matched-term
# set never leaves the executors — identical results, bounded driver.
DEFAULT_MAX_EXPANSIONS = 512


def _expand_or_distribute(
    index: InvertedIndex, term_pred: Column, max_expansions: int
) -> DataFrame:
    """Shared tail of fuzzy/wildcard search: bounded dictionary
    expansion. The probe collects at most ``max_expansions + 1`` terms
    (LIMIT-pushed, O(cap) driver memory even when millions match); the
    overflow branch is the search_regex-style fully distributed plan.
    Returns (doc_id)."""
    matched = index.term_stats.filter(term_pred).select("term")
    terms = [r["term"] for r in matched.limit(max_expansions + 1).collect()]
    if len(terms) <= max_expansions:
        return _docs_for_terms(index, sorted(terms))
    p = index.postings.filter(term_pred)
    return _live(index, p.select(F.explode("doc_ids").alias("doc_id")).distinct())


def search_fuzzy(
    index: InvertedIndex,
    term: str,
    max_dist: int = 1,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Fuzzy term search (beyond-reference): docs containing ANY
    dictionary term within Levenshtein distance ``max_dist`` of the
    lowercased query term (typo tolerance — ``vectr`` finds
    ``vector``). Like prefix search, the query term is NOT stemmed:
    edit distance is a surface-form notion.

    Plan: dictionary expansion then the ordinary OR. The expansion
    scans the metadata-sized term_stats dictionary with a JVM
    ``levenshtein`` filter (codegen, no Python) and brings at most
    ``max_expansions`` matched terms to the driver so the posting scan
    keeps its IN-filter parquet pushdown; past the cap (a huge edit
    ball) the levenshtein predicate moves onto the posting scan itself
    and stays fully distributed. At 10^8-term dictionary scale the
    linear scan is one narrow-column job; the classic upgrade (a
    deletion-neighborhood / FST dictionary index) changes only this
    expansion step. Returns (doc_id)."""
    q = term.strip().lower()
    spark = index.postings.sparkSession
    if not q:
        return spark.createDataFrame([], "doc_id long")
    return _expand_or_distribute(
        index,
        F.levenshtein(F.col("term"), F.lit(q)) <= max_dist,
        max_expansions,
    )


def search_wildcard(
    index: InvertedIndex,
    pattern: str,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Wildcard search (beyond-reference): docs containing ANY
    dictionary term matching the ``*``-pattern (``v*r`` -> vector,
    var, ...). ``*`` matches any run including empty; the pattern is
    lowercased, not stemmed (same surface-form rationale as prefix/
    fuzzy search).

    Plan: dictionary expansion via a LIKE filter on term_stats (a
    leading-literal pattern also row-group-prunes on the term-sorted
    layout), at most ``max_expansions`` matched terms to the driver,
    then the IN-filtered posting scan; past the cap (adversarial
    patterns like ``*e*``) the LIKE predicate moves onto the posting
    scan itself — no unbounded driver list. Returns (doc_id)."""
    pat = pattern.strip().lower()
    spark = index.postings.sparkSession
    if not pat or pat.strip("*") == "":
        return spark.createDataFrame([], "doc_id long")
    like = pat.replace("%", r"\%").replace("_", r"\_").replace("*", "%")
    return _expand_or_distribute(
        index, F.col("term").like(like), max_expansions
    )


def search_regex(
    index: InvertedIndex, pattern: str, top_k: int | None = None
) -> DataFrame:
    """Regex search (beyond-reference, Lucene ``RegexpQuery`` shape):
    docs containing ANY dictionary term matching ``pattern`` (anchored
    whole-term match, like Lucene), ranked by total matched tf with
    doc_id tiebreak. The pattern is applied to stored (lowercased)
    dictionary terms and is NOT stemmed; callers on stemmed indexes
    match stems (same surface-form caveat as prefix/wildcard search).

    Plan: one postings scan with the regex as a post-scan filter on the
    term column (a regex can't parquet-push, but column pruning keeps
    the scan at (term, doc_ids, tfs)), explode, hash aggregate, top-k.
    No dictionary round-trip to the driver — unlike wildcard search the
    matched-term set never leaves the executors, so an adversarial
    pattern matching half the dictionary still runs as one distributed
    plan. Returns (doc_id, n_terms, tf_sum).
    """
    pat = f"^(?:{pattern})$"  # whole-term semantics
    p = index.postings.filter(F.col("term").rlike(pat))
    hits = p.select(
        "term", F.explode(F.arrays_zip("doc_ids", "tfs")).alias("_z")
    ).select(
        "term", F.col("_z.doc_ids").alias("doc_id"), F.col("_z.tfs").alias("tf")
    )
    agg = hits.groupBy("doc_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("tf").cast("long").alias("tf_sum"),
    )
    out = _live(index, agg).orderBy(
        F.desc("tf_sum"), F.desc("n_terms"), F.asc("doc_id")
    )
    return out.limit(top_k) if top_k is not None else out


def suggest_terms(index: InvertedIndex, prefix: str, top_k: int = 10) -> DataFrame:
    """Autocomplete (beyond-reference): the top-k dictionary terms
    starting with the prefix, ranked by document frequency (df desc,
    term asc) — the standard search-box suggestion ranking.

    Plan: one StringStartsWith-pruned scan of the metadata-sized
    term_stats table + TakeOrderedAndProject; never touches postings.
    Returns (term, df)."""
    pfx = prefix.strip().lower()
    spark = index.postings.sparkSession
    if not pfx:
        return spark.createDataFrame([], "term string, df long")
    return (
        index.term_stats.filter(F.col("term").startswith(pfx))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top_k)
    )


# -- Q4: phrase ---------------------------------------------------------------

def search_phrase(index: InvertedIndex, phrase: list[str]) -> DataFrame:
    """Q4: consecutive-position phrase match on the positional index.

    Reference semantics (IIM:360-460): analyzer applied to the joined
    phrase (stop words removed SHIFT positions — positions are indexes
    in the filtered token list); doc matches iff exists p in
    pos(tok_0) with p+j in pos(tok_j) for all j.

    When the index carries compressed positions (pos_blob/pos_offsets —
    always true for persisted indexes, whose on-disk layout stores ONLY
    the blob), the plan PARTIAL-DECODES: candidate docs are computed
    from doc_ids alone (the AND semi-join), per-(term,doc) byte slices
    are cut JVM-side from the blob via the stored offsets (the
    reference's position-meta-slot lookup, SDM:187-193, 327-341), and
    only the candidates' slices cross into the Arrow decode UDF —
    decode volume is |candidates|·|phrase|, not Σ df(term). Otherwise
    falls back to the pure-JVM array-column join.
    """
    if not index.positional:
        raise ValueError("phrase search requires a positional index (IIM:364-366)")
    toks = _analyzed(index, phrase)
    spark = index.postings.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long")
    per_term = _per_term_positions(index, toks)
    return _live(index, _phrase_join(per_term, toks))


def _per_term_positions(index: InvertedIndex, toks: list[str]) -> DataFrame:
    """(term, doc_id, positions) for the query terms, restricted to
    docs containing ALL of them. Dispatch: raw stored arrays
    (in-memory build) -> pure-JVM array join; compressed-only or
    decode-projected positions (persisted index) -> partial decode of
    candidate byte slices."""
    p = _postings_for(index, toks)
    use_partial = "pos_blob" in p.columns and (
        "positions" not in p.columns
        or getattr(index, "positions_decoded", False)
    )
    if use_partial:
        return _phrase_positions_partial_decode(p, toks)
    return p.select(
        "term",
        F.explode(F.arrays_zip("doc_ids", "positions")).alias("_z"),
    ).select(
        "term",
        F.col("_z.doc_ids").alias("doc_id"),
        F.col("_z.positions").alias("positions"),
    )


def search_proximity(
    index: InvertedIndex, terms: list[str], slop: int
) -> DataFrame:
    """Unordered WITHIN-slop proximity search (beyond-reference; the
    reference stops at strict phrase, IIM:360-460): docs where some
    window of token positions [a, a+slop] contains at least one
    occurrence of EVERY distinct analyzed query term.

    The plan is the phrase plan — candidate docs computed from doc_ids
    alone, positions partial-decoded for candidates only — with the
    pos+j offset test replaced by a windowed exists. Every minimal
    match window starts at a query-term occurrence, so it suffices to
    anchor the window at the union of the terms' position lists; the
    whole test is JVM array lambdas, no Python in the row path.
    Returns (doc_id)."""
    if not index.positional:
        raise ValueError("proximity search requires a positional index")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    toks = sorted(set(_analyzed(index, terms)))
    spark = index.postings.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long")
    per_term = _per_term_positions(index, toks)
    parts = []
    for j, t in enumerate(toks):
        parts.append(
            per_term.filter(F.col("term") == t).select(
                "doc_id", F.col("positions").alias(f"p{j}")
            )
        )
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    anchors = F.array_distinct(
        F.concat(*[F.col(f"p{j}") for j in range(len(toks))])
    )

    def _window_ok(a: Column) -> Column:
        # NB: capture `a` by closure, not a lambda default — PySpark
        # reads the lambda arity to bind (element, index) variables.
        def _term_ok(j: int) -> Column:
            return F.exists(
                F.col(f"p{j}"), lambda q: (q >= a) & (q <= a + F.lit(slop))
            )

        return reduce(
            lambda acc, j: acc & _term_ok(j), range(len(toks)), F.lit(True)
        )

    return _live(
        index, joined.filter(F.exists(anchors, _window_ok)).select("doc_id")
    )


def search_span_near(
    index: InvertedIndex, terms: list[str], max_gap: int
) -> DataFrame:
    """Ordered span-near (the Lucene ``SpanNearQuery(inOrder=true)``
    shape; beyond-reference — the reference stops at strict phrase,
    IIM:360-460): docs where the analyzed terms appear IN ORDER with
    each consecutive pair at most ``max_gap`` positions apart
    (``max_gap=1`` degenerates to the strict phrase). Duplicate terms
    keep their order (each occurrence must advance).

    Plan: exactly the phrase plan — candidates from doc_ids alone,
    positions partial-decoded for candidates only — then ONE Arrow
    batch per candidate set running a LINEAR level-wise feasible-set
    merge (the ordered analogue of the reference phrase scan's
    two-pointer merge, IIM:424-435): S_0 = pos(tok_0); S_j = the
    positions q of tok_j with some s in S_{j-1} in [q-max_gap, q-1]
    (vectorized searchsorted over the sorted position lists — both
    sides ascending by construction of the positional index); the doc
    matches iff S_{last} is non-empty. Cost per candidate is
    O(Σ_j |pos_j| · log) — NOT the product of per-term window sizes a
    nested exists chain pays, so a pathological doc (one token
    repeated thousands of times, 6+ term query) stays linear-ish
    (tests/test_round4_ops.py::test_span_near_pathological_doc).
    Returns (doc_id)."""
    if not index.positional:
        raise ValueError("span-near search requires a positional index")
    if max_gap < 1:
        raise ValueError("max_gap must be >= 1")
    toks = _analyzed(index, terms)
    spark = index.postings.sparkSession
    if len(toks) < 2:
        # degenerate: single surviving term -> plain containment
        return _docs_for_terms(index, toks)
    per_term = _per_term_positions(index, sorted(set(toks)))
    parts = []
    for j, t in enumerate(toks):
        parts.append(
            per_term.filter(F.col("term") == t).select(
                "doc_id", F.col("positions").alias(f"p{j}")
            )
        )
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)

    gap = int(max_gap)

    @F.pandas_udf("boolean")
    def _span_ok(plists: pd.Series) -> pd.Series:
        out = np.zeros(len(plists), dtype=bool)
        for i, row in enumerate(plists):
            S = np.asarray(row[0], dtype=np.int64)
            for j in range(1, len(row)):
                if S.size == 0:
                    break
                pj = np.asarray(row[j], dtype=np.int64)
                # feasible q: exists s in S with q-gap <= s <= q-1
                lo = np.searchsorted(S, pj - gap, side="left")
                hi = np.searchsorted(S, pj, side="left")
                S = pj[hi > lo]
            out[i] = S.size > 0
        return pd.Series(out)

    arrs = F.array(*[F.col(f"p{j}") for j in range(len(toks))])
    return _live(
        index, joined.filter(_span_ok(arrs)).select("doc_id")
    )


def suggest_spelling(
    index: InvertedIndex, term: str, *, max_dist: int = 2, top_k: int = 5
) -> DataFrame:
    """Did-you-mean spelling correction (beyond-reference, the Lucene
    DirectSpellChecker shape): the top-k dictionary terms within
    Levenshtein distance ``max_dist`` of the lowercased query term,
    ranked by (distance asc, df desc, term asc) — closest first,
    popularity breaks ties. The query term itself is excluded (a
    correctly-spelled word suggests alternatives, not itself) and, like
    all surface-form queries, never stemmed.

    Plan: ONE scan of the metadata-sized term_stats dictionary with a
    JVM levenshtein projection + TakeOrderedAndProject; postings are
    never touched. Returns (term, df, dist)."""
    q = term.strip().lower()
    spark = index.postings.sparkSession
    if not q:
        return spark.createDataFrame([], "term string, df long, dist int")
    return (
        index.term_stats
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
        .filter((F.col("dist") <= max_dist) & (F.col("term") != q))
        .select("term", "df", "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(top_k)
    )


def _phrase_positions_partial_decode(p: DataFrame, toks: list[str]) -> DataFrame:
    """(term, doc_id, positions) for CANDIDATE docs only: AND-intersect
    on doc_ids, slice each candidate's position bytes out of pos_blob
    with the stored per-doc offsets (JVM substring — no decode), then
    varint-decode just those slices in one Arrow UDF."""
    uniq = sorted(set(toks))
    cand = (
        p.select("term", F.explode("doc_ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("_n"))
        .filter(F.col("_n") == len(uniq))
        .select("doc_id")
    )
    # per-(term, doc) byte slice, cut JVM-side (substring on binary is
    # 1-based; pos_offsets holds df+1 byte offsets per posting row)
    pairs = p.select(
        "term",
        F.explode(
            F.expr(
                "transform(sequence(0, size(doc_ids)-1), i -> struct("
                "doc_ids[i] as doc_id, "
                "substring(pos_blob, pos_offsets[i]+1, "
                "pos_offsets[i+1]-pos_offsets[i]) as pslice))"
            )
        ).alias("_z"),
    ).select("term", F.col("_z.doc_id").alias("doc_id"), F.col("_z.pslice").alias("_s"))
    hits = pairs.join(cand, "doc_id")  # partial decode: candidates only

    from ..functions.codec import delta_varint_decode

    @F.pandas_udf("array<int>")
    def _dec(slices: pd.Series) -> pd.Series:
        return pd.Series(
            [
                delta_varint_decode(bytes(s)).astype(np.int32)
                if s is not None
                else None
                for s in slices
            ]
        )

    return hits.select("term", "doc_id", _dec(F.col("_s")).alias("positions"))


def _phrase_join(per_term: DataFrame, toks: list[str]) -> DataFrame:
    """n-way join of per-(term,doc) position lists + the pos+j offset
    test (IIM:424-435) as JVM array expressions."""
    parts = []
    for j, t in enumerate(toks):
        parts.append(
            per_term.filter(F.col("term") == t).select(
                "doc_id", F.col("positions").alias(f"p{j}")
            )
        )
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    cond: Column = F.exists(
        F.col("p0"),
        lambda p0: reduce(
            lambda acc, j: acc & F.array_contains(F.col(f"p{j}"), p0 + j),
            range(1, len(toks)),
            F.lit(True),
        ),
    )
    return joined.filter(cond).select("doc_id")


# -- Q5-Q8: TF-IDF (reference semantics) --------------------------------------

def tfidf_scores(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Q5-Q8 exact reference semantics: idf = log10(N/df) (IIM:567);
    query weight = query-token-count × idf (IIM:671-689); score =
    dot / sqrt(Σ_query-terms (tf·idf)²) (IIM:629-650 — the norm runs
    over query-term components only, §2.4). Returns (doc_id, score)."""
    toks = _analyzed(index, terms)
    spark = index.postings.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long, score double")
    qtf: dict[str, int] = {}
    for t in toks:
        qtf[t] = qtf.get(t, 0) + 1
    qdf = spark.createDataFrame(
        [(t, float(n)) for t, n in sorted(qtf.items())], "term string, qtf double"
    )
    n_docs = float(index.n_docs)
    # idf from GLOBAL term stats (pass 1, IIM:543-569)
    idf = (
        index.term_stats.join(F.broadcast(qdf), "term")
        .withColumn("idf", F.log10(F.lit(n_docs) / F.col("df")))
        .select("term", "qtf", "idf")
    )
    p = _postings_for(index, list(qtf))
    hits = p.select(
        "term", F.explode(F.arrays_zip("doc_ids", "tfs")).alias("_z")
    ).select(
        "term", F.col("_z.doc_ids").alias("doc_id"), F.col("_z.tfs").alias("tf")
    )
    w = F.col("tf") * F.col("idf")
    scored = (
        hits.join(F.broadcast(idf), "term")
        .withColumn("_dot", w * F.col("qtf") * F.col("idf"))
        .withColumn("_len", w * w)
        .groupBy("doc_id")
        .agg(F.sum("_dot").alias("dot"), F.sum("_len").alias("len"))
        .withColumn(
            "score",
            F.when(F.col("len") > 0, F.col("dot") / F.sqrt("len")).otherwise(F.lit(0.0)),
        )
        .select("doc_id", "score")
    )
    return _live(index, scored)


def search_tfidf(index: InvertedIndex, terms: list[str], top_k: int | None) -> DataFrame:
    """Q5: ranked TF-IDF; top_k=None -> all matches (IIM:575-576).
    Returns (doc_id, score) ordered by (-score, doc_id)."""
    return top_k_df(tfidf_scores(index, terms), top_k)


# -- BM25 (the rebuild's primary ranker) ---------------------------------------

def bm25_scores_weighted(
    index: InvertedIndex, weights: dict[str, float]
) -> DataFrame:
    """BM25 over ALREADY-ANALYZED terms with explicit per-term query
    weights (the general form: plain queries use integer query-tf,
    relevance-feedback expansion uses fractional weights). k1=1.2,
    b=0.75; idf = ln(1+(N-df+.5)/(df+.5)). Returns (doc_id, score)."""
    spark = index.postings.sparkSession
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")
    qdf = spark.createDataFrame(
        [(t, float(w)) for t, w in sorted(weights.items())],
        "term string, qtf double",
    )
    idf = (
        index.term_stats.join(F.broadcast(qdf), "term")
        .withColumn("idf", index.bm25_idf_col())
        .select("term", "qtf", "idf")
    )
    p = _postings_for(index, list(weights))
    hits = p.select(
        "term", F.explode(F.arrays_zip("doc_ids", "tfs")).alias("_z")
    ).select(
        "term", F.col("_z.doc_ids").alias("doc_id"), F.col("_z.tfs").alias("tf")
    )
    dl = index.doc_stats
    denom = F.col("tf") + F.lit(K1) * (
        F.lit(1 - B) + F.lit(B) * F.col("doc_len") / F.lit(index.avg_len)
    )
    contrib = F.col("qtf") * F.col("idf") * F.col("tf") * F.lit(K1 + 1) / denom
    return _live(
        index,
        hits.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .withColumn("_c", contrib)
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("score"))
        .select("doc_id", "score"),
    )


def bm25_scores(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """BM25 with k1=1.2, b=0.75; idf = ln(1+(N-df+.5)/(df+.5)); query
    term multiplicity multiplies the contribution (consistent with the
    reference's query-tf treatment, IIM:674-677).
    Returns (doc_id, score)."""
    toks = _analyzed(index, terms)
    qtf: dict[str, float] = {}
    for t in toks:
        qtf[t] = qtf.get(t, 0.0) + 1.0
    return bm25_scores_weighted(index, qtf)


def search_bm25(index: InvertedIndex, terms: list[str], top_k: int | None) -> DataFrame:
    return top_k_df(bm25_scores(index, terms), top_k)


def search_bm25_page(
    index: InvertedIndex,
    terms: list[str],
    k: int,
    cursor: tuple[int, int] | None = None,
) -> DataFrame:
    """Keyset (search-after) pagination over the BM25 ranking —
    page boundaries on the rounded (score_e6, doc_id) sort key, so a
    page is a pure FILTER + top-k and never an OFFSET: page N costs
    the same one TakeOrderedAndProject as page 1, and a doc inserted
    between requests can't shift rows across already-served pages
    the way OFFSET pagination does. ``cursor`` is the (score_e6,
    doc_id) of the last row the client saw (None -> first page).
    Returns (doc_id, score_e6)."""
    scored = (
        bm25_scores(index, terms)
        .withColumn("score_e6", F.round(F.col("score") * 1_000_000).cast("long"))
        .select("doc_id", "score_e6")
    )
    if cursor is not None:
        se, did = int(cursor[0]), int(cursor[1])
        scored = scored.filter(
            (F.col("score_e6") < se)
            | ((F.col("score_e6") == se) & (F.col("doc_id") > did))
        )
    return scored.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(k)


def search_bm25_filtered(
    index: InvertedIndex,
    terms: list[str],
    allowed_docs: DataFrame,
    top_k: int | None,
) -> DataFrame:
    """BM25 restricted to a caller-supplied doc set (metadata-filtered
    search — e.g. ``documents.filter(lang == 'en')``). Standard search
    semantics: the filter selects which docs may appear in results
    while corpus-wide stats (idf, N, avg_len) are unchanged, so a doc's
    score is identical with and without the filter.

    The semi-join runs BEFORE top-k so filtered-out docs can't occupy
    result slots; at scale the allowed set is whatever the metadata
    predicate prunes to, and AQE broadcasts it when small. Returns
    (doc_id, score)."""
    scored = bm25_scores(index, terms)
    allowed = allowed_docs.select("doc_id")
    return top_k_df(scored.join(allowed, "doc_id", "left_semi"), top_k)


# -- Q17: top-k ---------------------------------------------------------------

def top_k_df(scored: DataFrame, top_k: int | None) -> DataFrame:
    """Deterministic top-k: ORDER BY score DESC, doc_id ASC [LIMIT k] →
    Catalyst TakeOrderedAndProject (per-partition heap, driver merge)."""
    out = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(top_k) if top_k is not None else out


# -- Q11/Q13: full scans ------------------------------------------------------

def full_scan_search(corpus: DataFrame, terms: list[str], *, stem: bool = True) -> DataFrame:
    """Q13 FullScanSearcher (the reference's debug oracle,
    FullScanSearcher.java:27-40): docs whose analyzed token list
    contains all analyzed query tokens. Pure DataFrame re-statement."""
    from .indexer import tokenize_corpus

    toks = sorted(set(analyze_query(terms, stem=stem)))
    if not toks:
        return corpus.sparkSession.createDataFrame([], "doc_id long")
    t = tokenize_corpus(corpus, stem=stem)
    cond = reduce(
        lambda acc, tok: acc & F.array_contains("tokens", tok), toks, F.lit(True)
    )
    return t.filter(cond).select("doc_id")


def fetch_documents(corpus: DataFrame, doc_ids: DataFrame) -> DataFrame:
    """DocStore point-lookup analogue (B10): join back to text."""
    return doc_ids.join(corpus, "doc_id").select("doc_id", "text")


def snippets(
    corpus: DataFrame,
    doc_ids: DataFrame,
    terms: list[str],
    *,
    stem: bool = False,
    width: int = 3,
) -> DataFrame:
    """Result snippets (beyond-reference): for each doc in ``doc_ids``,
    the analyzed-token window around the FIRST occurrence of any query
    term — positions ``[max(fp - width, 0), fp + width]`` over the
    post-stop-word token list, joined with single spaces. Docs with no
    occurrence are dropped.

    Plan: semi-join the corpus down to the requested docs FIRST (the
    DocStore point lookup), then tokenize only those rows — snippet
    cost is O(|result docs|), never a corpus scan. The window math is
    pure JVM array expressions (array_position / slice / concat_ws),
    no Python in the row path. Returns (doc_id, snippet)."""
    from ..functions.analysis import analyze_query
    from .indexer import tokenize_corpus

    toks = sorted(set(analyze_query(terms, stem=stem)))
    spark = corpus.sparkSession
    if not toks:
        return spark.createDataFrame([], "doc_id long, snippet string")
    hits = corpus.join(doc_ids.select("doc_id"), "doc_id", "left_semi")
    t = tokenize_corpus(hits, stem=stem)
    # 1-based first position of any query term; array_position = 0
    # means absent -> nullif, and least() skips nulls.
    fp = F.least(
        *[F.nullif(F.array_position("tokens", tok), F.lit(0)) for tok in toks]
    ) if len(toks) > 1 else F.nullif(
        F.array_position("tokens", toks[0]), F.lit(0)
    )
    t = t.withColumn("_fp", fp).filter(F.col("_fp").isNotNull())
    start = F.greatest(F.col("_fp") - width, F.lit(1))
    length = F.col("_fp") + width - start + F.lit(1)
    return t.select(
        "doc_id",
        F.concat_ws(" ", F.slice("tokens", start, length)).alias("snippet"),
    )


def facet_counts(
    doc_ids: DataFrame, docs_meta: DataFrame, facet_col: str
) -> DataFrame:
    """Faceted result counts (beyond-reference): bucket a query's doc
    set by a metadata column (lang, source, ...) and count. One
    broadcast-or-shuffle join plus a hash aggregate over at most
    |facet values| rows — the standard search-UI sidebar, expressed as
    the aggregation Catalyst already optimizes. Returns (facet, n)."""
    return (
        doc_ids.select("doc_id")
        .join(docs_meta.select("doc_id", facet_col), "doc_id")
        .groupBy(F.col(facet_col).alias("facet"))
        .agg(F.count("*").alias("n"))
    )
