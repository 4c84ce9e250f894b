"""Measure PER-MICRO-BATCH cost of the streaming ingest gates (r10
verdict task 7): every gate artifact quotes the 4-micro-batch replay
TOTAL, and SCALING.md claims the marginal cost of a steady-state
arrival is ONE micro-batch — this script measures that claim instead
of asserting it, by reading each batch's triggerExecution duration
from the engine's own StreamingQueryProgress (captured by
run_to_memory into streaming.windows.LAST_PROGRESS).

Batch 0 carries the one-time costs (sink/table setup, first plan
codegen, state-store open); batches 1..3 are the steady state. The
artifact records, per gate and per repetition, batchId →
durationMs.triggerExecution so first-vs-steady-state is a committed
number.

Usage: python scripts/stream_batch_timing.py [--sf DIR] [--reps N]
       [gate names...; default: ALL ELEVEN ingest gates (r11 verdict
       task 7 — the claim must be measured for every gate, not a
       representative subset)]
Writes STREAM_BATCH_TIMING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azurestorage_blueprints_spark.queries import load_all
from azurestorage_blueprints_spark.session import get_spark
from azurestorage_blueprints_spark.streaming import windows as sw

DEFAULT_GATES = [
    "q_stream_dedup_incremental",
    "q_stream_substring_incremental",
    "q_stream_curation_gate",
    "q_stream_ann_serving",
    "q_stream_model_drift",
    "q_stream_perplexity_gate",
    "q_stream_conformal_gate",
    "q_stream_dsir_gate",
    "q_stream_multimodal_gate",
    "q_stream_forget_gate",
    "q_stream_quantile_gate",
    "q_stream_decontamination_gate",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    gates = args or DEFAULT_GATES

    spark = get_spark(app_name="stream-batch-timing", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    out: dict = {"sf_dir": sf_dir, "reps": reps, "gates": {}}
    for name in gates:
        q = registry[name]
        runs = []
        for r in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            total = time.perf_counter() - t0
            batches = [
                {
                    "batchId": p.get("batchId"),
                    "triggerExecutionMs": (p.get("durationMs") or {}).get(
                        "triggerExecution"
                    ),
                    "addBatchMs": (p.get("durationMs") or {}).get("addBatch"),
                    "numInputRows": p.get("numInputRows"),
                }
                for p in sw.LAST_PROGRESS
                if p.get("numInputRows", 0) or p.get("batchId", 0) == 0
            ]
            runs.append({"total_sec": round(total, 3), "batches": batches})
        out["gates"][name] = runs
        # quick console summary: batch-0 vs median steady-state
        tb = [
            {b["batchId"]: b["triggerExecutionMs"] for b in r["batches"]}
            for r in runs
        ]
        print(name, json.dumps(tb))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "STREAM_BATCH_TIMING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote STREAM_BATCH_TIMING.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
