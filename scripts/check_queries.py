"""Oracle-check a SUBSET of registered queries by name — the quick
inner-loop companion to emit_oracle_local.py (same harness, same
canonicalization, no artifact written).

Usage:  python scripts/check_queries.py q_name1 q_name2 ... [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from azurestorage_blueprints_spark.oracle import _canon_frame, duckdb_connection
from azurestorage_blueprints_spark.queries import load_all


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check-queries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    registry = load_all()
    fails = 0
    for name in args:
        q = registry.get(name)
        if q is None:
            print(f"{name}: NOT REGISTERED")
            fails += 1
            continue
        t0 = time.time()
        try:
            s_pdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                print(f"{name}: rows-only, {len(s_pdf)} rows in {time.time() - t0:.1f}s")
            else:
                d_pdf = con.execute(q.oracle).df()
                ok = (
                    len(s_pdf) == len(d_pdf)
                    and sorted(s_pdf.columns) == sorted(d_pdf.columns)
                    and _canon_frame(s_pdf) == _canon_frame(d_pdf)
                )
                print(
                    f"{name}: {'HASH-PASS' if ok else 'MISMATCH'} "
                    f"({len(s_pdf)}/{len(d_pdf)} rows) in {time.time() - t0:.1f}s"
                )
                if not ok:
                    fails += 1
                    print("  spark cols:", sorted(s_pdf.columns))
                    print("  oracle cols:", sorted(d_pdf.columns))
                    print("  spark head:\n", s_pdf.head(5).to_string())
                    print("  oracle head:\n", d_pdf.head(5).to_string())
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
        spark.catalog.clearCache()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
