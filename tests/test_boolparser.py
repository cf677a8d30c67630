"""Boolean query-string parser: grammar unit tests (no Spark) plus
set-algebra evaluation against a hand-computed tiny corpus. The
sf-scale value gate runs through test_entry_vs_duckdb (boolean_query),
where the SAME parse renders the DuckDB oracle."""

import pytest

from peterman_search_engine_spark.operators.boolparser import (
    BoolParseError,
    Node,
    parse,
    search_boolean,
)


def test_parse_precedence_and_parens():
    n = parse("a OR b AND c")
    assert n.kind == "or"
    assert n.children[0] == Node("term", "a")
    assert n.children[1].kind == "and"
    n2 = parse("(a OR b) AND c")
    assert n2.kind == "and"
    assert n2.children[0].kind == "or"


def test_parse_implicit_and_and_not():
    n = parse("a b NOT c")
    assert n.kind == "and"
    assert [c.kind for c in n.children] == ["term", "term", "not"]


def test_parse_phrase_and_wildcard():
    n = parse('"fast table" OR wind*')
    assert n.children[0] == Node("phrase", "fast table")
    assert n.children[1] == Node("term", "wind*")
    # single-word phrase collapses to a term
    assert parse('"solo"') == Node("term", "solo")


def test_parse_case_insensitive_keywords_lowercased_terms():
    n = parse("Apple AND Banana")
    assert [c.value for c in n.children] == ["apple", "banana"]


def test_parse_errors():
    for bad in ["", "(a", "a)", "AND a", "a OR", "NOT", '""']:
        with pytest.raises(BoolParseError):
            parse(bad)


def test_to_sql_shapes():
    sql = parse("a AND NOT b").to_sql()
    assert "EXCEPT" in sql and "INTERSECT" not in sql
    sql2 = parse("a AND b").to_sql()
    assert "INTERSECT" in sql2
    sql3 = parse("NOT a").to_sql()
    assert sql3.startswith("(SELECT doc_id FROM documents) EXCEPT")


@pytest.fixture(scope="module")
def bool_index(spark):
    from peterman_search_engine_spark.operators.indexer import build_index

    rows = [
        (0, "apple banana"),
        (1, "apple cherry"),
        (2, "banana cherry"),
        (3, "apple banana cherry"),
        (4, "date fig"),
        (5, "fast table scan"),
        (6, "table fast"),  # words present, phrase order wrong
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(corpus, stem=False, positional=True, docs_per_segment=3)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_eval_boolean_combinations(bool_index):
    assert _ids(search_boolean(bool_index, "apple AND banana")) == [0, 3]
    assert _ids(search_boolean(bool_index, "apple OR date")) == [0, 1, 3, 4]
    assert _ids(search_boolean(bool_index, "apple AND NOT cherry")) == [0]
    assert _ids(search_boolean(bool_index, "NOT apple")) == [2, 4, 5, 6]
    assert _ids(search_boolean(bool_index, '"fast table"')) == [5]
    assert _ids(search_boolean(bool_index, '(apple OR date) AND NOT "fast table"')) == [0, 1, 3, 4]
    assert _ids(search_boolean(bool_index, "app* AND ban*")) == [0, 3]
    # implicit AND
    assert _ids(search_boolean(bool_index, "apple banana cherry")) == [3]
