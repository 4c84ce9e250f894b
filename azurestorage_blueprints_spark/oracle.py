"""Local oracle-differential harness.

Mirrors the driver's correctness gate: run a registered query on Spark
and its oracle SQL on DuckDB over the same parquet tables, then compare
row count, column names, and an order-insensitive value digest. Used by
the test suite so every mismatch is caught before the driver sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from azurestorage_blueprints_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize a cell for comparison across engines."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: determinism contract means bit-equality is expected
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _digest(rows: list[tuple], cols: list[str]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return tuple(canon_rows)


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (raises AssertionError)."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: {len(s_rows)} vs {len(d_rows)}"
    sd, dd = _digest(s_rows, s_cols), _digest(d_rows, d_cols)
    if sd != dd:
        diffs = [i for i, (a, b) in enumerate(zip(sd, dd)) if a != b][:5]
        detail = "\n".join(f"  spark={sd[i]}\n  duck ={dd[i]}" for i in diffs)
        raise AssertionError(f"value mismatch on {len(diffs)}+ sorted rows:\n{detail}")
