"""Table loading helpers for the driver-generated parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under an
``sf`` directory. At 100 TB these would be partitioned parquet/Delta
datasets on ``abfss://``; the loader only cares that
``spark.read.parquet(dir/name.parquet)`` resolves, so the same code
path serves both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (parquet scan — columnar, with
    predicate pushdown and column pruning left to Catalyst).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    reader rejects (PARQUET_TYPE_ILLEGAL); we read it as long via the
    ``nanosAsLong`` legacy conf and truncate to microseconds with
    integer arithmetic (``ts div 1000`` — exact for int64, matching
    DuckDB's ns→us truncation bit-for-bit).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestampadd on an NTZ base is pure integer arithmetic — independent
        # of the session timezone (timestamp_micros().cast(ntz) is NOT: it
        # renders through the session zone and shifts under TZ!=UTC drivers)
        return spark.read.parquet(path).withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views so SQL-form queries can run against them."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
