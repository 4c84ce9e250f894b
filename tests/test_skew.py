"""salted_join must be result-identical to the plain join while
actually spreading each hot key across salt values."""

from __future__ import annotations

from pyspark.sql import functions as F

from azurestorage_blueprints_spark.operators.skew import SALT_COL, salted_join
from azurestorage_blueprints_spark.tables import table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    dim = li.groupBy(F.col("l_returnflag")).agg(F.count(F.lit(1)).alias("flag_rows"))
    salted = salted_join(
        li, dim, "l_returnflag",
        salt_by=F.concat_ws("_", "l_orderkey", "l_linenumber"), n_salt=8,
    )
    plain = li.join(dim, "l_returnflag")
    cols = sorted(plain.columns)
    assert sorted(salted.columns) == cols
    a = sorted(tuple(r[c] for c in cols) for r in salted.collect())
    b = sorted(tuple(r[c] for c in cols) for r in plain.collect())
    assert a == b


def test_salt_spreads_hot_keys(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        SALT_COL,
        F.pmod(F.hash(F.concat_ws("_", "l_orderkey", "l_linenumber")), F.lit(8)),
    )
    per_salt = (
        salted.filter(F.col("l_returnflag") == "N")
        .groupBy(SALT_COL)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(per_salt) == 8, "hot key did not spread over all salts"
    counts = [r.n for r in per_salt]
    assert max(counts) < 2 * min(counts), f"salt distribution skewed: {counts}"


def test_salt_is_deterministic(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    expr = F.pmod(F.hash(F.concat_ws("_", "l_orderkey", "l_linenumber")), F.lit(8))
    s1 = {(r.l_orderkey, r.l_linenumber): r.s for r in li.select("l_orderkey", "l_linenumber", expr.alias("s")).collect()}
    s2 = {(r.l_orderkey, r.l_linenumber): r.s for r in li.select("l_orderkey", "l_linenumber", expr.alias("s")).collect()}
    assert s1 == s2
