"""Source/sink round-trips: every supported format must reproduce the
table (schema + values), writes must honor the per-verb mode matrix,
and partitioned writes must actually prune at read time."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from azurestorage_blueprints_spark.sources import read_table, write_table
from azurestorage_blueprints_spark.tables import table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_round_trip_orders(spark, sf_dir, tmp_path, fmt):
    orders = table(spark, sf_dir, "orders")
    out = str(tmp_path / f"orders_{fmt}")
    write_table(orders, out, fmt=fmt)
    back = read_table(spark, out, fmt=fmt, schema=orders.schema)
    cols = orders.columns
    assert back.columns == cols
    assert back.schema == orders.schema
    assert _rows(back, cols) == _rows(orders, cols)


def test_text_round_trip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    out = str(tmp_path / "docs_text")
    write_table(docs, out, fmt="text")
    back = read_table(spark, out, fmt="text")
    assert sorted(r.value for r in back.collect()) == sorted(r.value for r in docs.collect())


def test_binary_file_source(spark, sf_dir, tmp_path):
    # binaryFile reads whatever bytes exist — here, the parquet files
    # themselves serve as opaque blobs
    df = read_table(spark, f"{sf_dir}", fmt="binaryFile", pathGlobFilter="*.parquet")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 10  # one blob per table
    for r in rows:
        assert r.length == len(r.content) > 0


def test_write_mode_matrix(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_pq")
    write_table(nation, out)  # errorifexists: first write succeeds
    with pytest.raises(AnalysisException):
        write_table(nation, out)  # second errors (upload semantics)
    write_table(nation, out, mode="overwrite")  # download/move semantics
    assert read_table(spark, out).count() == nation.count()
    write_table(nation, out, mode="append")
    assert read_table(spark, out).count() == 2 * nation.count()
    write_table(nation, out, mode="ignore")  # no-op, not an error
    assert read_table(spark, out).count() == 2 * nation.count()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    write_table(orders, out, mode="overwrite", partition_by=("o_orderstatus",))
    # Hive-style layout on disk
    assert glob.glob(f"{out}/o_orderstatus=*"), "no partition directories written"
    pruned = read_table(spark, out).filter(F.col("o_orderstatus") == "F")
    # partition pruning: the scan must carry a PartitionFilters entry on
    # the partition column (inputFiles() reflects the pre-pruning index,
    # so inspect the physical plan instead)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == expected


def test_csv_without_schema_infers(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_table(nation, out, fmt="csv")
    back = read_table(spark, out, fmt="csv")
    assert back.count() == nation.count()
    assert [f.name for f in back.schema.fields] == nation.columns
