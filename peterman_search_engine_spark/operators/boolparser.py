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
    def to_sql(
        self,
        *,
        universe: str = "SELECT doc_id FROM documents",
        analyze=None,
    ) -> str:
        """Render as ANSI SQL over the toks CTE. ``analyze`` (optional)
        is the SAME analyzer the Spark side applies to non-wildcard
        term and phrase leaves (``list[str] -> list[str]``) — pass it
        when the index is stemmed so both renderings of the parse see
        identical leaf tokens."""
        if self.kind == "term":
            if "*" in self.value:
                t = self.value.replace("'", "''")
                pat = t.replace("%", r"\%").replace("_", r"\_").replace("*", "%")
                return (
                    "SELECT DISTINCT doc_id FROM toks "
                    f"WHERE tok LIKE '{pat}' ESCAPE '\\'"
                )
            toks = analyze([self.value]) if analyze else [self.value]
            if not toks:
                # analyzed away (stop word) -> matches nothing, exactly
                # like a term absent from the dictionary
                return "SELECT doc_id FROM toks WHERE FALSE"
            esc = [t.replace("'", "''") for t in toks]
            if len(esc) == 1:
                return f"SELECT DISTINCT doc_id FROM toks WHERE tok = '{esc[0]}'"
            in_list = ", ".join(f"'{t}'" for t in esc)
            return f"SELECT DISTINCT doc_id FROM toks WHERE tok IN ({in_list})"
        if self.kind == "phrase":
            # escape each word exactly like term leaves — a phrase
            # containing an apostrophe must not break/inject the oracle
            words = self.value.split()
            if analyze:
                words = analyze(words)
            if not words:
                return "SELECT doc_id FROM toks WHERE FALSE"
            words = [w.replace("'", "''") for w in words]
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
                sql = " INTERSECT ".join(
                    f"({c.to_sql(universe=universe, analyze=analyze)})" for c in pos
                )
            else:
                sql = f"({universe})"
            for n in neg:
                sql = f"({sql}) EXCEPT ({n.to_sql(universe=universe, analyze=analyze)})"
            return sql
        if self.kind == "or":
            return " UNION ".join(
                f"({c.to_sql(universe=universe, analyze=analyze)})"
                for c in self.children
            )
        if self.kind == "not":
            inner = self.children[0].to_sql(universe=universe, analyze=analyze)
            return f"({universe}) EXCEPT ({inner})"
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
        # run the leaf through the index analyzer so a stem=True index
        # resolves 'merges' to the stored stem exactly like search_and
        # does; a stop word analyzes to [] and matches nothing
        from .query import _analyzed

        return _docs_for_terms(index, _analyzed(index, [node.value]))
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
    Returns (doc_id). Non-wildcard term and phrase leaves run through
    the index analyzer (lowercase + stop words + stem when the index
    is stemmed), so ``search_boolean('merges')`` agrees with
    ``search_and(['merges'])`` on a stem=True index; a stop-word leaf
    analyzes to nothing and matches nothing. Wildcard leaves stay
    surface-form (same rationale as search_wildcard)."""
    return _eval(index, parse(query))


def boolean_oracle_sql(query: str, toks_cte: str, *, analyze=None) -> str:
    """The DuckDB oracle for the same query string: one parse, SQL
    rendering over the provided toks CTE. Pass the index's analyzer as
    ``analyze`` (``list[str] -> list[str]``) when the index is stemmed
    so oracle leaves match the Spark side's analyzed leaves."""
    body = parse(query).to_sql(analyze=analyze)
    return f"WITH {toks_cte}\nSELECT doc_id FROM ({body}) ORDER BY doc_id"
