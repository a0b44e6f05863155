"""Local replica of the driver's DuckDB-oracle gate: every oracle query
in __spark_entry__ must match DuckDB on row count, schema width and
(order-insensitive) values at sf0.001."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def _duck_con():
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    try:  # decimals from duckdb
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_oracle_query_matches(spark, name):
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = sorted(
        tuple(_norm(r[c]) for c in cols) for r in sdf.collect()
    )
    con = _duck_con()
    res = con.execute(E.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == cols, f"column mismatch: {sorted(duck_cols)} vs {cols}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = sorted(tuple(_norm(row[i]) for i in idx) for row in res.fetchall())
    assert len(spark_rows) == len(duck_rows), f"row count {len(spark_rows)} vs {len(duck_rows)}"
    if spark_rows != duck_rows:
        diffs = [
            (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark):
    for name, fn in E.ROWS_ONLY_QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns and "status" in df.columns
