"""SparkSession factory with scale-appropriate defaults.

Local test posture is ``local[N]`` but every knob is chosen so the same
plans survive a 1000-executor cluster: AQE on (runtime join-strategy
switch, skew-join splitting, partition coalescing), Arrow for any
Python exchange, UTC session timezone (oracle parity with DuckDB's
naive timestamps), and shuffle partitions sized to cores locally
(on a real cluster AQE coalesces from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "azurestorage_blueprints_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # match local cores; on a cluster AQE coalesces down from a larger value
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # localCheckpoint blocks (the iterative graph queries) are only
        # released when the driver GCs their RDD references; Spark's
        # default periodic-GC interval is 30 MINUTES, long enough for
        # dead checkpoint blocks and broadcast remnants to pressure the
        # unified memory every later query runs in (measured: a
        # 3-stage mapInPandas query degraded 1.3 → 4.5 s late in a
        # 69-query session). One minute keeps the ContextCleaner ahead
        # of the accumulation at negligible cost.
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
