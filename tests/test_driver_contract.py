"""Emulate the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB row-for-row (sorted, column
names aligned) at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df):
    df = df[sorted(df.columns)]
    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return round(v, 6)
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, con, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = con.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        sdf.columns, odf.columns)
    assert len(sdf) == len(odf)
    srows, orows = _normalize(sdf), _normalize(odf)
    mismatches = [
        (a, b) for a, b in zip(srows, orows) if a != b
    ]
    assert not mismatches, (name, mismatches[:3])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert "keep" in df.columns


def test_every_query_has_an_oracle():
    """Round-1 shipped 5 rows-only queries; round 2 oracles all of
    them (fixture-expected tables for the model/binary ops). Keep it
    that way: a new queries() entry must ship with an oracle."""
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())
