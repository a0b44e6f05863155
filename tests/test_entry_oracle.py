"""Local replica of the driver's DuckDB-oracle gate: every oracle query
in __spark_entry__ must match DuckDB on row count, schema width and
(order-insensitive) values at sf0.001."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

# default sf0.001 for speed; set PATHIK_ORACLE_SF_DIR=/root/testdata/sf0.01
# to replicate the driver's sweep scale exactly
SF_DIR = os.environ.get("PATHIK_ORACLE_SF_DIR", "/root/testdata/sf0.001")


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


_CANON_TYPE = {
    # spark simpleString -> canonical (integer widths merge: the driver's
    # typed hash is width-insensitive — round-1 evidence: row_number int
    # vs duck bigint hashed equal — but decimal/HUGEINT does NOT)
    "bigint": "integer", "int": "integer", "smallint": "integer", "tinyint": "integer",
    "double": "double", "float": "double", "string": "string",
    "boolean": "bool", "timestamp": "timestamp", "date": "date",
    # arrow (duckdb) -> canonical
    "int64": "integer", "int32": "integer", "int16": "integer", "int8": "integer",
    "uint64": "integer", "float64": "double", "float32": "double",
    "large_string": "string", "utf8": "string", "large_utf8": "string",
    "timestamp[us]": "timestamp", "date32[day]": "date",
}


def _canon(t: str) -> str:
    # decimals (incl. DuckDB HUGEINT -> decimal128) stay as-is so a
    # SUM-promotion mismatch FAILS here exactly like the driver's typed hash
    return _CANON_TYPE.get(t, t)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_oracle_query_matches(spark, name):
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_types = {f.name: _canon(f.dataType.simpleString()) for f in sdf.schema.fields}
    spark_rows = sorted(
        tuple(_norm(r[c]) for c in cols) for r in sdf.collect()
    )
    con = _duck_con()
    tbl = con.execute(E.oracle_sql()[name]).arrow()
    duck_types = {f.name: _canon(str(f.type)) for f in tbl.schema}
    duck_cols = list(tbl.schema.names)
    assert sorted(duck_cols) == cols, f"column mismatch: {sorted(duck_cols)} vs {cols}"
    for c in cols:
        assert spark_types[c] == duck_types[c], (
            f"{name}.{c}: type mismatch spark={spark_types[c]} duck={duck_types[c]}"
        )
    duck_data = {c: tbl.column(c).to_pylist() for c in cols}
    duck_rows = sorted(
        tuple(_norm(duck_data[c][i]) for c in cols) for i in range(tbl.num_rows)
    )
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
