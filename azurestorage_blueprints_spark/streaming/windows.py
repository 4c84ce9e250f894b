"""Structured Streaming pipelines over the ``events`` schema.

The batch time-series queries (queries/timeseries.py) use the very same
window expressions; these builders attach them to a streaming source
with watermarks so late data is handled the way a production pipeline
needs. Tests drive them with a file source (parquet drops into a
directory) + ``processAllAvailable`` for deterministic completion;
production would swap the source for Kafka/EventHubs without touching
the transformation.

Late-data contract:
- aggregations carry ``withWatermark(ts, ...)`` so state is bounded —
  the condition for running forever on an unbounded stream;
- ``dropDuplicates`` with watermark gives at-most-once per event_id
  within the watermark horizon (streaming exact dedup);
- append output mode emits a window only after the watermark passes
  its end — results are final, never retracted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-based streaming source (one file = one micro-batch of events)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def tumbling_counts(events: DataFrame, window: str = "15 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts per event_type with bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding 30-minute windows every 15 minutes."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (state merges as events arrive)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids within the
    watermark horizon (streaming exact dedup with bounded state)."""
    return events.withWatermark("ts", "30 minutes").dropDuplicates(["event_id"])


#: per-micro-batch progress of the most recent run_to_memory query
#: (r10 verdict task 7): the replayed gates quote a 4-micro-batch
#: TOTAL; this exposes each batch's batchId/durationMs so the
#: "marginal cost is one micro-batch" claim is measured, not asserted
#: (read by scripts/stream_batch_timing.py; zero effect on semantics —
#: recentProgress is collected by Spark regardless).
LAST_PROGRESS: list[dict] = []


#: shuffle/state partition count for streaming runs (r12, guide §2.2):
#: a streaming aggregation's state is partitioned by
#: spark.sql.shuffle.partitions AT QUERY START, and every micro-batch
#: pays one task launch + one state-store load/commit PER PARTITION.
#: The registry gates keep O(langs x buckets) ≈ O(10-100) state rows,
#: so state partitions sized to the batch session's scan parallelism
#: (cores locally, hundreds on a cluster) multiply pure per-batch
#: overhead: at 32 partitions a 4-batch replay commits 128 state files
#: to move ~40 state rows. 4 partitions is sized to the state
#: cardinality and stays fixed as cores scale — production ingest with
#: high-cardinality keyed state (e.g. the dedup gate's event_id space)
#: would raise it via the env knob to match throughput, which is why
#: it is parameterised rather than derived from cores. The default was
#: re-measured on a quiet box across 6 gates (3 light, 3 with real
#: per-batch shuffle work) at 8/4/2/1: monotone ~0.3-0.6 s/gate better
#: from 8 to 4 on EVERY gate, while 2 inverts on the gates whose
#: batches do real shuffle work (ann_serving 3.78 vs 3.55 med) — 4 is
#: the knee, keeping a little intra-batch parallelism headroom above
#: the O(10-100)-row state.
STREAM_SHUFFLE_PARTITIONS = int(
    __import__("os").environ.get("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "4")
)

#: base directory for the replay harness's EPHEMERAL checkpoints
#: (r12, guide §1.2 fixed overheads): every micro-batch fsyncs the
#: offset log, commit log and state-store files into the checkpoint
#: dir, and run_to_memory's checkpoint is temporary BY DESIGN — it is
#: deleted the moment the finite replay stops, so those fsyncs land on
#: whatever /tmp sits on (a disk here) for no durability benefit.
#: Default: tmpfs when the platform has one, else Spark's normal temp
#: checkpoint. Production ingest durability is an EXPLICIT
#: checkpointLocation on the query (the checkpoint-recovery test pins
#: that path) and is unaffected by this knob.
STREAM_CKPT_BASE = __import__("os").environ.get(
    "SPARK_GRAFT_STREAM_CKPT_BASE",
    "/dev/shm" if __import__("os").path.isdir("/dev/shm") else "",
)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming DataFrame to completion against its current
    source contents; results land in an in-memory table ``name``.
    Returns the materialized batch DataFrame.

    The session's shuffle-partition count is lowered to
    :data:`STREAM_SHUFFLE_PARTITIONS` for the duration of the stream
    (state partitioning is captured at query start) and restored
    afterwards — state tasks are sized to state cardinality, batch
    plans keep the session's scan-parallelism-sized setting."""
    import json as _json
    import shutil
    import tempfile

    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    ckpt = (
        tempfile.mkdtemp(prefix="sg_ckpt_", dir=STREAM_CKPT_BASE)
        if STREAM_CKPT_BASE
        else None
    )
    try:
        w = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
        )
        if ckpt:
            w = w.option("checkpointLocation", ckpt)
        q = w.start()
        try:
            q.processAllAvailable()
        finally:
            try:
                LAST_PROGRESS[:] = [_json.loads(p.json) for p in q.recentProgress]
            except Exception:  # instrumentation must never fail the query
                LAST_PROGRESS[:] = []
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def run_foreach_batch(stream_df: DataFrame, sink):
    """Exactly-once custom sink via foreachBatch: ``sink(df, epoch_id)``
    is invoked per micro-batch (the production pattern for writing to
    stores without a native streaming sink)."""
    q = stream_df.writeStream.foreachBatch(sink).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
