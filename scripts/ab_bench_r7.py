"""A/B the three r6 bench upticks (r6 verdict task 1).

q_dedup_minhash_lsh 1.93→3.0 s, q_dedup_containment 2.56→3.1 s and
q_graph_assortativity 2.46→3.1 s were reported r5→r6 with NO plan
change; the r5 number was the published SPREAD-MIN while r6 publishes
the MEDIAN, and r6 added the boundary-GC + drain-pause measurement
protocol. This script runs each query in ONE session under BOTH
protocols so the delta can be attributed:

  A (r6 protocol): boundary System.gc() + 1.5 s drain before the
    sample block, then N timed runs → median (and min).
  B (r5-style):   no boundary GC at all → median (and min).

If protocol-A-median ≈ r6's number while both protocols' MINs sit at
r5's number, the delta is measurement protocol (median-vs-min plus the
post-GC first-sample tax), not code creep. Each query also alternates
A/B blocks twice to cancel session-age drift.

Usage: python scripts/ab_bench_r7.py   (writes one JSON line to stdout)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azurestorage_blueprints_spark.queries import load_all  # noqa: E402
from azurestorage_blueprints_spark.session import get_spark  # noqa: E402

QUERIES = ["q_dedup_minhash_lsh", "q_dedup_containment", "q_graph_assortativity"]
RUNS = 5


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def sample_block(spark, registry, name, sf_dir, boundary_gc: bool) -> list[float]:
    if boundary_gc:
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.5)
    out = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run_query(registry[name].fn(spark, sf_dir))
        out.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-bench-r7")
    registry = load_all()
    result: dict[str, dict] = {}
    for name in QUERIES:
        run_query(registry[name].fn(spark, sf_dir))  # warm-up (JIT+footers)
        spark.catalog.clearCache()
        a_samples: list[float] = []
        b_samples: list[float] = []
        # interleave A,B,A,B to cancel session-age drift
        for _ in range(2):
            a_samples += sample_block(spark, registry, name, sf_dir, boundary_gc=True)
            b_samples += sample_block(spark, registry, name, sf_dir, boundary_gc=False)
        result[name] = {
            "A_r6_protocol": {
                "median": round(statistics.median(a_samples), 3),
                "min": min(a_samples),
                "samples": a_samples,
            },
            "B_r5_style": {
                "median": round(statistics.median(b_samples), 3),
                "min": min(b_samples),
                "samples": b_samples,
            },
        }
        print(f"# {name}: A={result[name]['A_r6_protocol']}", file=sys.stderr)
        print(f"# {name}: B={result[name]['B_r5_style']}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
