"""Scan-stage parallelism floor for compute-heavy per-row stages.

Guide §2.5/§6 (r12 optimization): a parquet ROW GROUP is the atomic
read unit, so a table written as one compact file with one row group
scans as ONE task no matter how many cores the session has — and any
heavy per-row work fused into that scan stage (Arrow-batched decode,
signature folds, tokenize+explode feeding a partial aggregate) runs
serial. At production scale the same table arrives as many files/row
groups and the scan stage parallelizes naturally, which is why this is
a conditional floor, not an unconditional repartition: when the source
already provides at least the session's default parallelism, it is a
no-op (an unconditional repartition would ADD a pointless shuffle at
scale — and even locally, keyless repartition pays the
sort-before-repartition tax, so it is only worth it ahead of work that
dwarfs it).

Place the spread AFTER source filters (predicate pushdown to the scan
is unaffected — the filter sits below the exchange) and immediately
BEFORE the compute-heavy stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to the session's default parallelism when
    its current plan yields fewer partitions; identity otherwise."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
