"""Statistical-modeling primitives as first-class queries.

Training-data curation and warehouse analytics both lean on in-engine
statistics: trend fits over time (drift detection, forecasting
features) and contingency/association tests (label-balance audits,
feature-target dependence). Both are expressed as single-pass
aggregations over EXACT integer moments — quantize the inputs once
(cents / day counts), accumulate bigint sums (order-insensitive), and
derive the float statistics at the very end from identical integer
inputs with a shared IEEE expression tree, so the result value-hash
matches the DuckDB oracle bit-for-bit (see the determinism contract in
queries/__init__.py).

Scale posture (100 TB): each query is one hash-aggregation keyed on a
low-cardinality group (nation / priority x status) — partial (map-side)
aggregation reduces every partition to a handful of moment rows before
the shuffle, so the exchange carries O(groups) rows regardless of input
size. The window-based marginal sums in the chi-square query operate on
the already-aggregated cell table (tens of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries import register
from azurestorage_blueprints_spark.tables import table

# OLS closed form over exact integer moments, spelled once and formatted
# into BOTH engines so the double expression tree is identical
# (doubles are deterministic iff inputs and operation order match).
_SLOPE = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_INTERCEPT = f"(CAST(sy AS DOUBLE) - ({_SLOPE}) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"


@register(
    "q_stats_linreg",
    oracle=f"""
    WITH pts AS (
      SELECT n_name,
             datediff('day', DATE '1995-01-01', o_orderdate) AS x,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ),
    m AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY n_name
    )
    SELECT n_name, n, {_SLOPE} AS slope_cents_per_day, {_INTERCEPT} AS intercept_cents
    FROM m
    """,
    doc="Per-nation OLS trend of order value (cents) over time (days since "
    "1995-01-01): one pass accumulates the five exact integer moments "
    "(n, Sx, Sy, Sxy, Sxx) as bigints — order-insensitive, map-side "
    "combined — then slope/intercept are derived doubles from identical "
    "integer inputs via a shared expression tree, so an order-sensitive "
    "double reduction never happens and the fit is value-hash exact. At "
    "100 TB the shuffle carries 5 longs per nation. The closed form keeps "
    "products inside doubles (not int64) because n*Sxy can exceed int64 at "
    "large SF; the moments themselves stay well inside both int64 and the "
    "2^53 double-exact range.",
)
def q_stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("x"),
            F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias("y"),
        )
    )
    m = pts.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        "n_name",
        "n",
        F.expr(_SLOPE).alias("slope_cents_per_day"),
        F.expr(_INTERCEPT).alias("intercept_cents"),
    )


# chi-square cell contribution from exact integer marginals; expected
# count and the squared deviation share one expression text across
# engines (same doubles in -> same doubles out)
_EXPECTED = "CAST(row_tot * col_tot AS DOUBLE) / CAST(grand AS DOUBLE)"
_CHISQ_TERM = (
    f"(CAST(obs AS DOUBLE) - ({_EXPECTED})) * (CAST(obs AS DOUBLE) - ({_EXPECTED}))"
    f" / ({_EXPECTED})"
)


@register(
    "q_stats_chisq",
    oracle=f"""
    WITH cells AS (
      SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS obs
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    marg AS (
      SELECT o_orderpriority, o_orderstatus, obs,
             CAST(sum(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS row_tot,
             CAST(sum(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS col_tot,
             CAST(sum(obs) OVER () AS BIGINT) AS grand
      FROM cells
    )
    SELECT o_orderpriority, o_orderstatus, obs,
           {_EXPECTED} AS expected,
           {_CHISQ_TERM} AS chisq_term
    FROM marg
    """,
    doc="Chi-square contingency analysis of order priority x order status: "
    "one hash-agg builds the cell table (O(|priority| x |status|) rows), "
    "window sums over that tiny table produce the exact integer marginals, "
    "and each cell's expected count + chi-square contribution are derived "
    "doubles from identical integer inputs (shared expression text). The "
    "per-cell terms are emitted instead of the order-sensitive total sum "
    "so the result stays hash-deterministic; the caller sums the column "
    "for the statistic. The 100 TB pass is the first agg only — partial "
    "aggregation collapses each partition to at most 15 cells.",
)
def q_stats_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("obs")
    )
    marg = cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "obs",
        F.sum("obs").over(W.partitionBy("o_orderpriority")).alias("row_tot"),
        F.sum("obs").over(W.partitionBy("o_orderstatus")).alias("col_tot"),
        F.sum("obs").over(W.partitionBy()).alias("grand"),
    )
    return marg.select(
        "o_orderpriority",
        "o_orderstatus",
        "obs",
        F.expr(_EXPECTED).alias("expected"),
        F.expr(_CHISQ_TERM).alias("chisq_term"),
    )


# Spearman rho over exact integer ranks, spelled once and formatted into
# BOTH engines (identical IEEE expression tree — see _SLOPE above)
_RHO = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@register(
    "q_stats_spearman",
    oracle=f"""
    WITH spend AS (
      SELECT c.c_nationkey AS nationkey, c.c_custkey, c.c_acctbal,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, c.c_custkey, c.c_acctbal
    ),
    ranked AS (
      SELECT nationkey,
             CAST(rank() OVER (PARTITION BY nationkey
                               ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rx,
             CAST(rank() OVER (PARTITION BY nationkey
                               ORDER BY spend, c_custkey) AS BIGINT) AS ry
      FROM spend
    ),
    m AS (
      SELECT nationkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy
      FROM ranked GROUP BY nationkey
    )
    SELECT nationkey, n, {_RHO} AS spearman_rho FROM m
    """,
    doc="Spearman rank correlation between customer account balance and "
    "total spend, per nation: rank both variables inside the nation "
    "(deterministic total order — value then the unique customer key, "
    "so the ranks are an exact permutation and the statistic is "
    "hash-checkable; classical average-rank tie handling would drag "
    "engine-specific float averaging into the shuffle), then Pearson "
    "over the integer ranks from exact bigint moments. The monotone- "
    "association screen (outliers can't dominate like in q_stats_corr). "
    "Shape: one pre-aggregate join, both rank windows share the nation "
    "partitioning (one shuffle + sort), one moment hash-agg per nation "
    "— the shuffle carries O(nations) moment rows.",
)
def q_stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend")
        )
    )
    ranked = spend.select(
        F.col("c_nationkey").alias("nationkey"),
        F.rank()
        .over(W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey"))
        .cast("bigint")
        .alias("rx"),
        F.rank()
        .over(W.partitionBy("c_nationkey").orderBy("spend", "c_custkey"))
        .cast("bigint")
        .alias("ry"),
    )
    m = ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
    )
    return m.select("nationkey", "n", F.expr(_RHO).alias("spearman_rho"))


@register(
    "q_stats_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_disc(value, 0.25) AS q1,
             quantile_disc(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           min(q.q1) AS q1, min(q.q3) AS q3,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
    doc="Tukey IQR outlier screen per event type: quartiles via "
    "percentile_disc (actual data values — bit-exact doubles across "
    "engines), fences at 1.5x IQR (per-row IEEE arithmetic from "
    "identical inputs), outlier counts as exact integers. The "
    "distribution-free third rung of the anomaly ladder next to the "
    "trailing z-score (q_ts_zscore_anomaly) and MAD (q_stats_mad). "
    "Shape: one percentile agg keyed on event_type (a handful of "
    "groups), the O(groups) fence table broadcast back onto the scan, "
    "one counting agg — the fact table never shuffles on anything "
    "wider than event_type.",
)
def q_stats_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
    )
