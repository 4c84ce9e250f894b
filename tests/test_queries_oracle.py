"""Oracle-differential test over the full query registry.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json):
each registered query runs on Spark and, when it has an oracle, the
result must match DuckDB's answer exactly (row count + columns +
order-insensitive value digest). Queries without an oracle get a
rows-materialize smoke check.
"""

from __future__ import annotations

import pytest

from azurestorage_blueprints_spark.oracle import compare
from azurestorage_blueprints_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = df.collect()
        assert isinstance(rows, list)  # materializes without error
    else:
        compare(df, duck, q.oracle)
