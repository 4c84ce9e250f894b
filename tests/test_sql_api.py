"""SQL entry path: the same Catalyst plans must be reachable through
``spark.sql`` over registered views — a user can drive the engine with
SQL strings instead of the DataFrame API and get identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries import load_all
from azurestorage_blueprints_spark.tables import register_views

REGISTRY = load_all()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_q1_matches_dataframe_plan(spark, sf_dir):
    register_views(spark, sf_dir, ("lineitem",))
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = (
        REGISTRY["q01_pricing_summary"]
        .fn(spark, sf_dir)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    )
    assert _rows(sql_df) == _rows(df)


def test_sql_join_matches_dataframe_plan(spark, sf_dir):
    register_views(spark, sf_dir, ("customer", "orders"))
    sql_df = spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
        """
    )
    c, o = spark.table("customer"), spark.table("orders")
    df = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(sql_df) == _rows(df)


def test_views_cover_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in ("region", "nation", "lineitem", "events", "documents", "embeddings"):
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").first().n > 0
