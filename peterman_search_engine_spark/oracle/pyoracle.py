"""Single-node pure-Python oracle reimplementing the reference
engine's semantics exactly (SURVEY.md §5: "add a single-node
pure-Python oracle ... and assert the Spark engine is rank-identical").

Semantics carried over from /root/reference/ with citations:

* analyzer: PunctuationTokenizer + stop list + Porter
  (``analysis/ComposableAnalyzer.java:21-23``) — shares the SAME
  ``_analyze_py`` implementation as the Spark UDF so the two cannot
  drift; parity of that shared code with the reference is covered by
  golden tests.
* positions are indexes in the post-stop-word token list
  (``InvertedIndexManager.java:173-184``).
* docIDs are dense ints in insertion order (``IIM:60, 194-197``) —
  here: position in the (conv_id, turn_idx)-ordered corpus.
* AND search: posting-set intersection (``IIM:318-329, 1148-1169``).
* OR search: posting-set union (``IIM:337-348``).
* phrase search: analyzer applied to the joined phrase (``IIM:374``);
  doc matches iff positions satisfy pos(tok_0) + j == pos(tok_j) for
  all j (``IIM:424-435``).
* TF-IDF (``IIM:502-668``): idf = log10(N / df) (``IIM:567``); query
  vector = raw query-token count × idf (``IIM:671-689``); score =
  dot(doc, query) / sqrt(sum over QUERY TERMS ONLY of (tf·idf)²)
  (``IIM:629-650`` — the reference normalizes over query-term
  components only, NOT the full doc norm; §2.4 landmine).
* top-k tiebreak: (-score, doc_id) — the reference's heap is
  insertion-order dependent (§2.4); the oracle defines the canonical
  deterministic tiebreak, and the Spark engine uses the same.
* PageRank (``search/IcsSearchEngine.java:63-106``): Jacobi iteration
  PR(p) = (1-d) + d·Σ PR_prev(q)/outdeg(q), d = 0.85, prev init 1,
  UNNORMALIZED, fixed iteration count, no convergence test.
* BM25 (rebuild's primary ranker, north star; not in the reference):
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
  score = Σ idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·len/avglen)),
  k1 = 1.2, b = 0.75.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from ..functions.analysis import _analyze_py

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], *, stem: bool = True):
        """docs: list of (doc_id, text) — doc_id dense ints in stable
        corpus order."""
        self.stem = stem
        self.doc_ids = [d for d, _ in docs]
        self.tokens: dict[int, list[str]] = {
            d: _analyze_py(t, stem) for d, t in docs
        }
        # postings: term -> {doc_id: [positions]}
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        for d, toks in self.tokens.items():
            for pos, tok in enumerate(toks):
                self.postings[tok].setdefault(d, []).append(pos)
        self.doc_len = {d: len(t) for d, t in self.tokens.items()}
        self.n_docs = len(docs)
        self.avg_len = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    # -- analysis ----------------------------------------------------------
    def analyze(self, terms: list[str]) -> list[str]:
        return _analyze_py(" ".join(terms), self.stem)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def tf(self, term: str, doc: int) -> int:
        return len(self.postings.get(term, {}).get(doc, ()))

    # -- boolean -----------------------------------------------------------
    def search_and(self, terms: list[str]) -> list[int]:
        toks = self.analyze(terms)
        if not toks:
            return []
        sets = [set(self.postings.get(t, {})) for t in set(toks)]
        out = set.intersection(*sets) if sets else set()
        return sorted(out)

    def search_or(self, terms: list[str]) -> list[int]:
        toks = self.analyze(terms)
        out: set[int] = set()
        for t in set(toks):
            out |= set(self.postings.get(t, {}))
        return sorted(out)

    def search_keyword(self, term: str) -> list[int]:
        return self.search_and([term]) if term.strip() else []

    # -- phrase (IIM:360-460) ----------------------------------------------
    def search_phrase(self, phrase: list[str]) -> list[int]:
        toks = self.analyze(phrase)
        if not toks:
            return []
        if any(t not in self.postings for t in toks):
            return []
        cand = set(self.postings[toks[0]])
        for t in toks[1:]:
            cand &= set(self.postings[t])
        out = []
        for d in sorted(cand):
            p0 = self.postings[toks[0]][d]
            ok = any(
                all((p + j) in set(self.postings[toks[j]][d]) for j in range(1, len(toks)))
                for p in p0
            )
            if ok:
                out.append(d)
        return out

    # -- TF-IDF (reference semantics) ---------------------------------------
    def tfidf_scores(self, terms: list[str]) -> dict[int, float]:
        toks = self.analyze(terms)
        if not toks:
            return {}
        qtf = Counter(toks)
        idf = {}
        for t in qtf:
            dfv = self.df(t)
            idf[t] = math.log10(self.n_docs / dfv) if dfv > 0 else 0.0
        dot: dict[int, float] = defaultdict(float)
        norm: dict[int, float] = defaultdict(float)
        for t in qtf:
            if self.df(t) == 0:  # term skipped entirely (IIM:617)
                continue
            q_w = qtf[t] * idf[t]
            for d in self.postings[t]:
                w = self.tf(t, d) * idf[t]
                dot[d] += w * q_w
                norm[d] += w * w
        return {
            d: (dot[d] / math.sqrt(norm[d])) if norm[d] > 0 else 0.0
            for d in dot
        }

    def search_tfidf(self, terms: list[str], top_k: int | None) -> list[tuple[int, float]]:
        scores = self.tfidf_scores(terms)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked if top_k is None else ranked[:top_k]

    # -- BM25 ----------------------------------------------------------------
    def bm25_idf(self, term: str) -> float:
        dfv = self.df(term)
        return math.log(1.0 + (self.n_docs - dfv + 0.5) / (dfv + 0.5))

    def bm25_scores(self, terms: list[str]) -> dict[int, float]:
        toks = self.analyze(terms)
        qtf = Counter(toks)
        scores: dict[int, float] = defaultdict(float)
        for t, qn in qtf.items():
            if self.df(t) == 0:
                continue
            idf = self.bm25_idf(t)
            for d in self.postings[t]:
                tf = self.tf(t, d)
                denom = tf + K1 * (1 - B + B * self.doc_len[d] / self.avg_len)
                scores[d] += qn * idf * tf * (K1 + 1) / denom
        return dict(scores)

    def search_bm25(self, terms: list[str], top_k: int | None) -> list[tuple[int, float]]:
        ranked = sorted(self.bm25_scores(terms).items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked if top_k is None else ranked[:top_k]


def pagerank(
    edges: list[tuple[int, int]],
    num_iterations: int,
    *,
    damping: float = 0.85,
) -> dict[int, float]:
    """Reference PageRank parity (IcsSearchEngine.java:63-106): nodes =
    every id appearing as src or dst; prev init 1.0; Jacobi sweeps;
    unnormalized; dangling nodes contribute nothing."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = Counter(s for s, _ in edges)
    incoming: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        incoming[d].append(s)
    prev = {n: 1.0 for n in nodes}
    for _ in range(num_iterations):
        cur = {}
        for n in nodes:
            s = sum(prev[q] / outdeg[q] for q in incoming.get(n, ()))
            cur[n] = (1 - damping) + damping * s
        prev = cur
    return prev
