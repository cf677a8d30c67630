"""Replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB over the same parquet, compare row count, schema arity, and the
full (column-name-sorted, row-sorted) value set exactly.

Runs at sf0.001 to stay fast; the driver runs the same comparison at
sf0.01.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("PSE_TEST_SF_DIR", "/root/testdata/sf0.001")
# oracle_sql() keys its stemmed-token fixture on this env var (the
# driver compares at sf0.01, its default); align it with this run's SF
os.environ["PSE_TEST_SF_DIR"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df):
    """pandas DataFrame -> sorted list of row tuples over name-sorted
    columns, with NaN-safe normalization."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                elif v == int(v) and abs(v) < 2**62:
                    norm.append(int(v))
                else:
                    norm.append(v)
            elif isinstance(v, bytes):
                norm.append(v.hex())
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=repr)


NAMES = sorted(E.queries().keys())


def test_query_and_oracle_keys_align():
    assert set(E.oracle_sql().keys()) <= set(E.queries().keys())


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", NAMES)
def test_matches_duckdb_oracle(spark, ddb, name):
    fn = E.queries()[name]
    sql = E.oracle_sql().get(name)
    got = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert got.shape[0] >= 0  # rows-only check, like the driver
        return
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert got.shape[0] == want.shape[0], (
        f"{name}: row count {got.shape[0]} vs {want.shape[0]}"
    )
    g, w = _canon(got), _canon(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
