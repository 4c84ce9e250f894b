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
        # whole-stage codegen emits a fresh class per distinct plan; a
        # long shared session running hundreds of distinct plans fills
        # the JVM's default 240 MB code cache, the JIT shuts off, and
        # codegen-heavy queries fall back to the interpreter (measured:
        # a 2 s query degraded to 20-33 s late in a 69-query benchmark
        # while staying flat for 14 straight runs in a fresh session).
        # 1 GiB of reserved code cache removes the cliff.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # NOTE on long shared sessions: localCheckpoint blocks (the
        # iterative graph queries) are only released when the driver
        # GCs their RDD references, and Spark's periodic GC defaults to
        # every 30 minutes — accumulation measurably degraded
        # late-sequence queries in a 69-query session. The fix lives at
        # the WORKLOAD boundary (bench.py triggers System.gc() between
        # queries), NOT here: a short periodicGC interval fires full
        # GCs mid-query and injects multi-second stop-the-world pauses
        # into unrelated measurements (observed 18 s outliers at 1min).
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
