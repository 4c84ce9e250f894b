"""Relational surface extensions: boolean/bitwise aggregates, discrete
percentiles, calendar-spine densification, and snapshot diffing (CDC).

These round out the aggregate/temporal corners of the ANSI surface the
engine claims: ``bool_and/bool_or`` and ``bit_and/bit_or/bit_xor`` are
ordinary one-shuffle hash-aggs; ``percentile_disc`` picks an actual
data value (no interpolation, so the double compares exactly across
engines); the calendar spine is generated row-source + outer join —
the standard gap-densification pattern; the snapshot diff is the
full-outer-join change classification every CDC pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries import register
from azurestorage_blueprints_spark.tables import table


@register(
    "q_bool_bit_aggs",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0) AS all_above_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(bit_and(o_custkey) AS BIGINT) AS key_bit_and,
           CAST(bit_or(o_custkey) AS BIGINT) AS key_bit_or,
           CAST(bit_xor(o_custkey) AS BIGINT) AS key_bit_xor,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Boolean and bitwise aggregates (bool_and/bool_or, "
    "bit_and/bit_or/bit_xor) per order priority. All five are "
    "associative+commutative, so Spark computes them with map-side "
    "partial aggregation — the shuffle carries one partial per "
    "(partition, priority), constant-size regardless of row count. "
    "bit_xor over a key column is the classic distributed checksum.",
)
def q_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("bool_and(o_totalprice > 1000.0)").alias("all_above_1k"),
        F.expr("bool_or(o_orderstatus = 'F')").alias("any_finished"),
        F.expr("bit_and(o_custkey)").cast("bigint").alias("key_bit_and"),
        F.expr("bit_or(o_custkey)").cast("bigint").alias("key_bit_or"),
        F.expr("bit_xor(o_custkey)").cast("bigint").alias("key_bit_xor"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_percentile_disc",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90,
           CAST(count(value) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    doc="Discrete percentiles (percentile_disc / quantile_disc) of event "
    "value per event type. Unlike interpolated percentiles, disc "
    "returns an ACTUAL data value, so the doubles compare bit-exactly "
    "across engines with no decimal scaffolding. Exact percentile is a "
    "sort-based agg (per-group sort inside the hash-agg); at 100 TB "
    "swap to approx_percentile sketches (q_approx_percentile_sketch) — "
    "this query is the exactness rung of that ladder.",
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("p25"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY value)").alias("p90"),
        F.count("value").alias("n"),
    )


#: calendar-spine bounds (testdata order dates span 1995-01..2001-08;
#: the spine runs past the data edge so the zero-fill rows are visible)
_SPINE_START, _SPINE_END = "1995-01-01", "2001-12-01"


@register(
    "q_calendar_spine",
    oracle=f"""
    WITH spine AS (
      SELECT CAST(unnest(generate_series(
               DATE '{_SPINE_START}', DATE '{_SPINE_END}', INTERVAL 1 MONTH))
             AS DATE) AS month
    ),
    monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders GROUP BY 1
    )
    SELECT s.month,
           COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.n_customers, 0) AS n_customers
    FROM spine s LEFT JOIN monthly m ON s.month = m.month
    """,
    doc="Calendar-spine densification: a generated month spine "
    "(sequence + explode — a row source with no input scan) LEFT JOINed "
    "to monthly order aggregates so months with zero orders appear "
    "explicitly — the gap-free axis every reporting/training-curve "
    "query needs. The spine is tiny and broadcast; the aggregate side "
    "is one hash-agg keyed on month (84 rows at any scale).",
)
def q_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                f"sequence(DATE '{_SPINE_START}', DATE '{_SPINE_END}', interval 1 month)"
            )
        ).alias("month")
    )
    monthly = o.groupBy(F.trunc("o_orderdate", "month").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return (
        F.broadcast(spine)
        .join(monthly, "month", "left")
        .select(
            "month",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


#: snapshot cutoffs: state of the per-customer order ledger at A vs B
_SNAP_A, _SNAP_B = "1997-01-01", "1999-01-01"


@register(
    "q_snapshot_diff",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderdate < DATE '{_SNAP_A}' GROUP BY o_custkey
    ),
    snap_b AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderdate < DATE '{_SNAP_B}' GROUP BY o_custkey
    )
    SELECT CASE WHEN a.o_custkey IS NULL THEN 'added'
                WHEN b.n_orders > a.n_orders THEN 'changed'
                ELSE 'same' END AS change_type,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(b.n_orders - COALESCE(a.n_orders, 0)) AS BIGINT)
             AS order_delta
    FROM snap_b b LEFT JOIN snap_a a ON a.o_custkey = b.o_custkey
    GROUP BY 1
    """,
    doc="Snapshot diff (CDC classification): the per-customer order "
    "ledger at two cutoff dates, outer-joined on the key and classified "
    "added / changed / same with the aggregate order delta per class. "
    "(The ledger is append-only so 'removed' cannot occur; the CASE arm "
    "order is the standard 4-way classifier.) Both snapshots scan the "
    "same table with pushed-down date predicates; the join keys on "
    "custkey — at 100 TB both sides are pre-aggregated BEFORE the "
    "join, so the shuffle carries one row per customer, not per order.",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def snap(cutoff: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderdate") < F.lit(cutoff).cast("date"))
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    a = snap(_SNAP_A).select(
        F.col("o_custkey").alias("a_key"), F.col("n_orders").alias("a_n")
    )
    b = snap(_SNAP_B).select(
        F.col("o_custkey").alias("b_key"), F.col("n_orders").alias("b_n")
    )
    joined = b.join(a, b.b_key == a.a_key, "left")
    change = (
        F.when(F.col("a_key").isNull(), F.lit("added"))
        .when(F.col("b_n") > F.col("a_n"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("change_type")
    )
    return (
        joined.select(change, "b_n", F.coalesce("a_n", F.lit(0)).alias("a_n0"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("b_n") - F.col("a_n0")).cast("bigint").alias("order_delta"),
        )
    )
