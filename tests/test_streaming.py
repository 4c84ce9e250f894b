"""Structured Streaming tests: deterministic replay of the events table
through file-source micro-batches, compared against the equivalent
batch computation (the no-late-data case must agree exactly)."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.streaming import windows as SW
from azurestorage_blueprints_spark.tables import table


@pytest.fixture()
def stream_dir(spark, sf_dir, tmp_path):
    """Events re-written as time-ordered parquet files → micro-batches
    that respect the watermark's bounded-lateness assumption (a file
    arriving entirely out of order would be *correctly* dropped as late
    data, which is not what this equality test wants to measure)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    ev = table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    ev = ev.orderBy("ts").cache()
    lo = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (lo[1] - lo[0]) / 4
    for i in range(4):
        part = ev.filter(
            (F.col("ts") >= lo[0] + i * span)
            # last chunk is unbounded above: a strict < max(ts) bound
            # would drop the max-timestamp event(s) from the replay
            & ((F.col("ts") < lo[0] + (i + 1) * span) if i < 3 else F.lit(True))
        )
        part.coalesce(1).write.parquet(str(tmp_path / f"chunk{i}"))
        pq = sorted(glob.glob(str(tmp_path / f"chunk{i}" / "part-*.parquet")))[0]
        shutil.copy(pq, src / f"{i:04d}.parquet")
    return str(src)


def test_tumbling_counts_stream_equals_batch(spark, sf_dir, stream_dir):
    stream = SW.read_events_stream(spark, stream_dir)
    result = SW.run_to_memory(SW.tumbling_counts(stream), "t_tumbling")
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.bucket, r.event_type): r.n for r in result.collect()}
    want = {(r.w.start, r.event_type): r.n for r in batch.collect()}
    # append mode: windows past the watermark are emitted; every emitted
    # window must agree exactly with the batch computation
    assert got, "stream produced no finalized windows"
    for k, n in got.items():
        assert want.get(k) == n, f"window {k}: stream {n} != batch {want.get(k)}"


def test_session_counts_stream(spark, stream_dir):
    stream = SW.read_events_stream(spark, stream_dir)
    result = SW.run_to_memory(SW.session_counts(stream), "t_sessions")
    rows = result.collect()
    assert rows, "no finalized sessions emitted"
    assert all(r.n_events >= 1 for r in rows)


def test_streaming_dedup_drops_replayed_files(spark, stream_dir, tmp_path):
    # duplicate every source file → every event arrives twice
    dup_dir = tmp_path / "dup_src"
    dup_dir.mkdir()
    for i, f in enumerate(sorted(glob.glob(f"{stream_dir}/*.parquet"))):
        shutil.copy(f, dup_dir / f"a{i}.parquet")
        shutil.copy(f, dup_dir / f"b{i}.parquet")
    stream = SW.read_events_stream(spark, str(dup_dir))
    result = SW.run_to_memory(SW.streaming_dedup(stream), "t_dedup")
    ids = [r.event_id for r in result.collect()]
    assert len(ids) == len(set(ids)), "duplicate event_ids survived streaming dedup"
    assert len(ids) > 0


def test_foreach_batch_sink_sees_all_rows(spark, stream_dir):
    stream = SW.read_events_stream(spark, stream_dir)
    seen = []
    SW.run_foreach_batch(
        stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        lambda df, epoch: seen.append((epoch, {r.event_type: r.n for r in df.collect()})),
    )
    assert seen, "foreachBatch sink never invoked"
    # final epoch's counts must cover all five event types
    final = seen[-1][1]
    assert sum(final.values()) > 0


def test_stateful_running_totals(spark, sf_dir, stream_dir):
    """applyInPandasWithState: per-user totals accumulated across
    micro-batches must converge to the batch groupBy answer."""
    from azurestorage_blueprints_spark.streaming.stateful import running_user_totals

    stream = SW.read_events_stream(spark, stream_dir)
    result = SW.run_to_memory(
        running_user_totals(stream), "t_stateful", output_mode="update"
    )
    # update mode emits one row per (user, batch); the LAST emission per
    # user carries the lifetime totals
    rows = result.collect()
    assert rows, "stateful operator emitted nothing"
    final = {}
    for r in rows:  # memory sink appends in emission order
        final[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, r.total)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, total) in final.items():
        assert n == batch[uid][0], f"user {uid}: stream count {n} != batch {batch[uid][0]}"
        assert abs(total - batch[uid][1]) < 1e-6 * max(1.0, abs(batch[uid][1]))


def test_gate_checkpoint_recovery(spark, sf_dir, tmp_path):
    """Production ingest RESTARTS: a gate stopped mid-replay (after ~2
    of its 4 micro-batches, checkpointLocation on disk) and restarted
    from the same checkpoint must recover its aggregation state and
    produce the exact full-replay funnel — the state-store recovery
    property 100 TB ingest actually needs. The single-run replay the
    registered rungs use never exercises it."""
    import time

    from azurestorage_blueprints_spark.queries.streaming_q import _ppl_gate_stream

    ckpt = str(tmp_path / "gate_ckpt")

    def start(name):
        return (
            _ppl_gate_stream(spark, sf_dir)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start("gate_recovery_a")
    try:
        # stop mid-replay: wait until at least batch 1 (the 2nd of 4
        # micro-batches) has committed, then kill the query
        deadline = time.time() + 180
        while time.time() < deadline:
            lp = q1.lastProgress
            if lp is not None and lp["batchId"] >= 1:
                break
            time.sleep(0.25)
        else:
            raise AssertionError("gate never committed its 2nd micro-batch")
    finally:
        q1.stop()
    batches_before = q1.lastProgress["batchId"] + 1
    assert batches_before < 4, "stop raced past the full replay — not a recovery test"

    # restart from the SAME checkpoint: offsets + state store recover,
    # the remaining micro-batches stream in, complete mode rebuilds the
    # full funnel table
    q2 = start("gate_recovery_b")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    import json

    resumed_first = json.loads(q2.recentProgress[0].json)["batchId"]
    assert resumed_first >= batches_before - 1, (
        f"restart reprocessed from batch {resumed_first}, "
        f"not from the checkpointed offset {batches_before}"
    )
    got = sorted(map(tuple, spark.sql("SELECT * FROM gate_recovery_b").collect()))

    # batch oracle: the registered rung's single uninterrupted replay
    from azurestorage_blueprints_spark.queries import load_all

    want = sorted(
        map(tuple, load_all()["q_stream_perplexity_gate"].fn(spark, sf_dir).collect())
    )
    assert got == want, "recovered funnel diverged from the uninterrupted replay"
