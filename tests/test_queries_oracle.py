"""Self-check of the driver contract: every oracle-backed query in
``__spark_entry__`` must match its DuckDB oracle at sf0.001 — same columns,
same row count, same values order-insensitively. This mirrors the driver's
CORRECTNESS gate so mismatches surface in pytest first."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    # (is_present, value) pairs keep NULL-bearing rows sortable (the outer
    # interval join emits nulls; None is unorderable against values)
    if v is None:
        return (0, 0)
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (1, round(v, 9))
    return (1, v)


def _rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entrymod.oracle_sql()[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sv = _rows_to_set(s_rows, s_cols)
    dv = _rows_to_set(d_rows, d_cols)
    mism = [(a, b) for a, b in zip(sv, dv) if a != b]
    assert not mism, f"{name}: first value mismatches: {mism[:3]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
