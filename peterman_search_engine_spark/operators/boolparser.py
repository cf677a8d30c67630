"""Boolean query-string parser + evaluator.

The reference exposes AND/OR only as separate Java entry points
(``searchAndQuery`` / ``searchOrQuery``, InvertedIndexManager.java:
1156-1159); real search surfaces take ONE query string. This module
parses

    expr   := or
    or     := and ('OR' and)*
    and    := unary ('AND' unary)*      (adjacency = implicit AND)
    unary  := 'NOT' unary | atom
    atom   := '(' expr ')' | '"phrase words"' | term
    term   := bare word; may contain '*' wildcards, e.g. spar*

into an AST, then compiles it to a DataFrame plan by set algebra over
(doc_id) frames:

* leaf term     -> the ordinary IN-pruned posting scan (OR of its
                   analyzed tokens; '*' terms expand via the
                   dictionary like search_wildcard)
* leaf phrase   -> positional phrase match
* AND           -> left_semi join           (intersection)
* OR            -> unionByName + distinct   (union)
* NOT x         -> doc_stats anti-join x    (complement over the live
                   corpus universe)

AND(a, NOT b) is rewritten to an anti-join (a EXCEPT b) so the
complement never materializes the near-full universe set — the only
case where NOT's O(N) complement survives is a top-level bare NOT,
which genuinely selects ~all docs.

The SAME AST prints itself as ANSI SQL (``Node.to_sql``) using
INTERSECT / UNION / EXCEPT over the shared toks CTE — the DuckDB
oracle and the Spark plan are two renderings of one parse, so the
grammar itself is under the driver's value-hash gate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r'\(|\)|"[^"]*"|[^\s()]+')


class BoolParseError(ValueError):
    pass


@dataclass
class Node:
    kind: str          # 'term' | 'phrase' | 'and' | 'or' | 'not'
    value: str | None = None
    children: tuple["Node", ...] = ()

    # -- SQL rendering (oracle side) ------------------------------------
    def to_sql(self, *, universe: str = "SELECT doc_id FROM documents") -> str:
        if self.kind == "term":
            t = self.value.replace("'", "''")
            if "*" in t:
                pat = t.replace("%", r"\%").replace("_", r"\_").replace("*", "%")
                return (
                    "SELECT DISTINCT doc_id FROM toks "
                    f"WHERE tok LIKE '{pat}' ESCAPE '\\'"
                )
            return f"SELECT DISTINCT doc_id FROM toks WHERE tok = '{t}'"
        if self.kind == "phrase":
            words = self.value.split()
            base = "SELECT DISTINCT t0.doc_id FROM toks t0"
            joins = "".join(
                f" JOIN toks t{j} ON t{j}.doc_id = t0.doc_id"
                f" AND t{j}.pos = t0.pos + {j}"
                f" AND t{j}.tok = '{w}'"
                for j, w in enumerate(words[1:], start=1)
            )
            return f"{base}{joins} WHERE t0.tok = '{words[0]}'"
        if self.kind == "and":
            pos = [c for c in self.children if c.kind != "not"]
            neg = [c.children[0] for c in self.children if c.kind == "not"]
            if pos:
                sql = " INTERSECT ".join(f"({c.to_sql(universe=universe)})" for c in pos)
            else:
                sql = f"({universe})"
            for n in neg:
                sql = f"({sql}) EXCEPT ({n.to_sql(universe=universe)})"
            return sql
        if self.kind == "or":
            return " UNION ".join(f"({c.to_sql(universe=universe)})" for c in self.children)
        if self.kind == "not":
            return f"({universe}) EXCEPT ({self.children[0].to_sql(universe=universe)})"
        raise BoolParseError(f"unknown node kind {self.kind}")


def parse(query: str) -> Node:
    toks = _TOKEN_RE.findall(query)
    if not toks:
        raise BoolParseError("empty query")
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or() -> Node:
        parts = [parse_and()]
        while peek() is not None and peek().upper() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else Node("or", children=tuple(parts))

    def parse_and() -> Node:
        parts = [parse_unary()]
        while True:
            nxt = peek()
            if nxt is None or nxt == ")" or nxt.upper() == "OR":
                break
            if nxt.upper() == "AND":
                take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else Node("and", children=tuple(parts))

    def parse_unary() -> Node:
        nxt = peek()
        if nxt is None:
            raise BoolParseError("unexpected end of query")
        if nxt.upper() == "NOT":
            take()
            return Node("not", children=(parse_unary(),))
        return parse_atom()

    def parse_atom() -> Node:
        nxt = take()
        if nxt == "(":
            inner = parse_or()
            if peek() != ")":
                raise BoolParseError("unbalanced parenthesis")
            take()
            return inner
        if nxt == ")":
            raise BoolParseError("unexpected ')'")
        if nxt.startswith('"'):
            words = nxt.strip('"').lower().split()
            if not words:
                raise BoolParseError("empty phrase")
            if len(words) == 1:
                return Node("term", value=words[0])
            return Node("phrase", value=" ".join(words))
        if nxt.upper() in ("AND", "OR"):
            raise BoolParseError(f"misplaced operator {nxt}")
        return Node("term", value=nxt.lower())

    root = parse_or()
    if pos != len(toks):
        raise BoolParseError(f"trailing input at {toks[pos]!r}")
    return root


# -- Spark evaluation ----------------------------------------------------------

def _eval(index, node: Node) -> DataFrame:
    from .query import (
        _docs_for_terms,
        _live,
        search_phrase,
        search_wildcard,
    )

    if node.kind == "term":
        if "*" in node.value:
            return search_wildcard(index, node.value)
        return _docs_for_terms(index, [node.value])
    if node.kind == "phrase":
        return search_phrase(index, node.value.split())
    if node.kind == "or":
        out = _eval(index, node.children[0])
        for c in node.children[1:]:
            out = out.unionByName(_eval(index, c))
        return out.distinct()
    if node.kind == "and":
        pos = [c for c in node.children if c.kind != "not"]
        neg = [c.children[0] for c in node.children if c.kind == "not"]
        if pos:
            out = _eval(index, pos[0])
            for c in pos[1:]:
                out = out.join(_eval(index, c), "doc_id", "left_semi")
        else:
            out = _universe(index)
        for n in neg:
            out = out.join(_eval(index, n), "doc_id", "left_anti")
        return out
    if node.kind == "not":
        return _universe(index).join(
            _eval(index, node.children[0]), "doc_id", "left_anti"
        )
    raise BoolParseError(f"unknown node kind {node.kind}")


def _universe(index) -> DataFrame:
    from .query import _live

    return _live(index, index.doc_stats.select("doc_id"))


def search_boolean(index, query: str) -> DataFrame:
    """Parse and run a boolean query string against the index.
    Returns (doc_id). Terms are lowercased; the analyzer's stop-word
    list applies to leaf terms implicitly (a stop word is absent from
    the dictionary, so it matches nothing — callers wanting reference
    AND-semantics over stop words should pre-analyze)."""
    return _eval(index, parse(query))


def boolean_oracle_sql(query: str, toks_cte: str) -> str:
    """The DuckDB oracle for the same query string: one parse, SQL
    rendering over the provided toks CTE."""
    body = parse(query).to_sql()
    return f"WITH {toks_cte}\nSELECT doc_id FROM ({body}) ORDER BY doc_id"
