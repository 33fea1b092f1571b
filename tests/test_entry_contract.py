"""Mimic the driver's correctness gate: every queries() entry vs its
oracle_sql() on DuckDB — row count, column names, order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:  # decimals → float-ish string
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_norm(r[i])) for i in order) for r in rows
    )


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_rows = df.collect()
    spark_cols = df.columns
    assert len(spark_rows) >= 0  # smoke: runs

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) > 0, f"{name}: rows-only query returned nothing"
        return
    res = ddb.execute(sql)
    oracle_rows = res.fetchall()
    oracle_cols = [d[0] for d in res.description]

    assert sorted(spark_cols) == sorted(oracle_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(oracle_rows), f"{name}: row count {len(spark_rows)} != {len(oracle_rows)}"
    got = _rows_to_multiset(spark_cols, [tuple(r) for r in spark_rows])
    want = _rows_to_multiset(oracle_cols, oracle_rows)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert got == want, f"{name}: value mismatch, first diffs: {mismatches[:3]}"


def test_entry_smoke(spark):
    # entry() is the q52 lake lifecycle (merge -> CAS commit -> read_keys)
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "event_type", "content", "commit_seq"]
