"""Bucketed tables: pre-shuffled storage layout so equi-joins on the
bucket key run WITHOUT an exchange — the 100 TB co-located join
pattern (both sides hash-partitioned into the same bucket count at
write time; Spark's scan reports the partitioning and Catalyst drops
the shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.tables import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # explicit per-table paths: spark.sql.warehouse.dir is static config
    wh = tmp_path_factory.mktemp("warehouse")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    joined = lineitem_b.join(orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey)
    agg = joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # co-located: the join itself must not introduce an exchange on
    # either side (the only allowed exchange is the final aggregation's)
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    n_exchanges_total = plan.count("Exchange hashpartitioning")
    assert n_exchanges_total <= 1, f"bucketed join still shuffles:\n{plan[:2000]}"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    orders_b, lineitem_b = bucketed
    got = (
        lineitem_b.join(orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = (
        table(spark, sf_dir, "lineitem")
        .join(table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.o_orderpriority, r.n) for r in got} == {(r.o_orderpriority, r.n) for r in want}
