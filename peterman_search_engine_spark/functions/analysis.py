"""Analyzers — SURVEY.md §2.1 (A1-A7).

Reference semantics (cited into /root/reference/):

* ``PunctuationTokenizer`` (A1, ``analysis/PunctuationTokenizer.java:26-70``):
  split on whitespace and the punctuation set ``{, . ; ? !}``,
  lowercase, drop empty tokens and the fixed 127-word stop list (A2).
* ``PorterStemmer`` (A3, ``analysis/PorterStemmer.java:18-36``): classic
  Porter stemming of each token.
* ``ComposableAnalyzer`` (A4, ``analysis/ComposableAnalyzer.java:21-23``):
  tokenizer ∘ stemmer.
* ``NaiveAnalyzer`` (A5, ``analysis/NaiveAnalyzer.java:13-15``):
  lowercase whitespace split, no stop words.
* ``WordBreakTokenizer`` (A6/A7, ``analysis/WordBreakTokenizer.java:89-159``):
  DP segmentation of space-free text maximizing sum of log p(token),
  stop words removed after the split.

Two execution strategies:

* ``tokens_expr`` / ``analyze_expr`` — pure Column expressions
  (split/lower/filter/transform). These stay inside whole-stage
  codegen on the JVM: zero Python in the hot path. Used whenever
  stemming is not required (stemming cannot be expressed in builtins).
* ``analyze_udf`` — ONE fused Arrow-vectorized pandas UDF
  (tokenize + stop-filter + Porter stem in a single pass over each
  Arrow batch). Per-row Python is never used (input_hint mandate).

Position semantics: token positions are assigned AFTER stop-word
removal — position = index in the filtered token list
(``InvertedIndexManager.java:173-184``). Both strategies return the
filtered list, so ``posexplode`` downstream yields exactly those
positions.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .stemmer import porter_stem
from .stopwords import STOP_WORDS

# Reference split set: whitespace + , . ; ? !  (PunctuationTokenizer.java:26-30)
TOKEN_SPLIT_RE = r"[\s,.;?!]+"

def _stop_array() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])


def tokens_expr(text: Column | str, *, keep_stopwords: bool = False) -> Column:
    """A1/A2 as a pure Column expression: lowercase, split on the
    reference punctuation set, drop empties (and stop words unless
    ``keep_stopwords``). Runs entirely JVM-side (codegen)."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), TOKEN_SPLIT_RE)
    toks = F.filter(toks, lambda t: t != F.lit(""))
    if not keep_stopwords:
        stop = _stop_array()
        toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return toks


def naive_tokens_expr(text: Column | str) -> Column:
    """A5 NaiveAnalyzer: lowercase whitespace split, empties dropped,
    stop words KEPT (``analysis/NaiveAnalyzer.java:13-15``)."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def _analyze_py(text: str, stem: bool) -> list[str]:
    """Single-string analyzer shared by the Arrow UDF and the pure
    Python oracle — one definition so engine and oracle cannot drift."""
    import re

    out = []
    for tok in re.split(TOKEN_SPLIT_RE, text.lower()):
        if not tok or tok in STOP_WORDS:
            continue
        out.append(porter_stem(tok) if stem else tok)
    return out


def analyze_udf(*, stem: bool = True):
    """A4 ComposableAnalyzer as ONE fused Arrow-vectorized pandas UDF:
    text -> array<string> (tokenize + stop-filter + Porter stem in a
    single pass per Arrow batch)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _analyze(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batch_iter:
            yield s.map(lambda t: _analyze_py(t, stem) if t is not None else None)

    return _analyze


def analyze_query(terms: list[str], *, stem: bool = True) -> list[str]:
    """Driver-side analysis of a (tiny) query. The reference analyzes
    the space-joined keyword list, preserving duplicates — duplicates
    feed the query term frequency (``InvertedIndexManager.java:516,
    674-677``)."""
    return _analyze_py(" ".join(terms), stem)


# ---------------------------------------------------------------------------
# A6/A7 — DP word-break tokenizer (optional analyzers in the reference)
# ---------------------------------------------------------------------------

def word_break(text: str, freq_dict: dict[str, float]) -> list[str]:
    """DP segmentation maximizing sum(log p(token)) over a frequency
    dictionary; raises ValueError if the text cannot be segmented
    (``WordBreakTokenizer.java:108-141``). Stop words are removed
    AFTER the split (``:152-154``). ``freq_dict`` maps word ->
    probability (or raw frequency; only relative order matters)."""
    s = text.lower().strip()
    if not s:
        return []
    total = sum(freq_dict.values())
    logp = {w: math.log(f / total) for w, f in freq_dict.items()}
    n = len(s)
    max_word = max((len(w) for w in freq_dict), default=0)
    # best[i] = (score, split_point) for s[:i]
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_word), i):
            if best[j] == NEG:
                continue
            w = s[j:i]
            lp = logp.get(w)
            if lp is None:
                continue
            sc = best[j] + lp
            if sc > best[i]:
                best[i] = sc
                back[i] = j
    if best[n] == NEG:
        raise ValueError(f"text cannot be word-broken: {text!r}")
    toks: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        toks.append(s[j:i])
        i = j
    toks.reverse()
    return [t for t in toks if t not in STOP_WORDS]


def word_break_udf(freq_dict: dict[str, float]):
    """A6/A7 as an Arrow UDF; the dictionary is captured in the closure
    and shipped once per executor (broadcast-by-closure)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _wb(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batch_iter:
            yield s.map(lambda t: word_break(t, freq_dict) if t is not None else None)

    return _wb
