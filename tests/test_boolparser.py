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


def test_to_sql_escapes_apostrophes_in_terms_and_phrases():
    # ADVICE r3: phrase words must get the same '' escaping as term
    # leaves — "don't stop" used to render broken/injectable SQL
    sql = parse('''"don't stop"''').to_sql()
    assert "'don''t'" in sql and "'stop'" in sql
    sql2 = parse("don't").to_sql()
    assert "'don''t'" in sql2
    # injection shape: a quote trying to close the literal stays inert
    sql3 = parse('''"a'; drop table toks"''').to_sql()
    assert "''" in sql3 and "drop" in sql3.lower()


def test_to_sql_analyze_hook():
    from peterman_search_engine_spark.functions.analysis import analyze_query

    def ana(ws):
        return analyze_query(ws, stem=True)

    sql = parse("merges").to_sql(analyze=ana)
    assert "tok = 'merg'" in sql
    # a stop-word leaf analyzes away and matches nothing
    sql2 = parse("the").to_sql(analyze=ana)
    assert "WHERE FALSE" in sql2
    # phrase words are analyzed too
    sql3 = parse('"merges tables"').to_sql(analyze=ana)
    assert "'merg'" in sql3 and "'tabl'" in sql3


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


@pytest.fixture(scope="module")
def stemmed_bool_index(spark):
    from peterman_search_engine_spark.operators.indexer import build_index

    rows = [
        (0, "merge conflicts resolved"),
        (1, "merging tables quickly"),
        (2, "merges happen daily"),
        (3, "nothing relevant here"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(corpus, stem=True, positional=True, docs_per_segment=2)


def test_boolean_leaves_are_analyzed_on_stemmed_index(stemmed_bool_index):
    """ADVICE r3: boolean term leaves run through the index analyzer,
    so search_boolean('merges') agrees with search_and(['merges']) on
    a stem=True index (the dictionary stores stems)."""
    from peterman_search_engine_spark.operators.query import search_and

    got = _ids(search_boolean(stemmed_bool_index, "merges"))
    want = _ids(search_and(stemmed_bool_index, ["merges"]))
    assert got == want == [0, 1, 2]
    # stop-word leaf matches nothing, so the AND collapses to empty
    assert _ids(search_boolean(stemmed_bool_index, "merges AND the")) == []
    # and phrase leaves analyze identically to search_phrase
    assert _ids(search_boolean(stemmed_bool_index, '"merging tables"')) == [1]


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
