"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in windows (streaming/windows.py) cover time-bucketed
aggregation, ``applyInPandasWithState`` is the escape hatch for
operator semantics Spark has no primitive for: per-key mutable state
carried across micro-batches with explicit timeout control. The state
schema is declared up front, so Spark shuffles each key to a stable
partition and snapshots state to the checkpoint — at 100 TB this is
the same bounded-state story as watermarked windows, with state size
= O(distinct keys), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime running totals (count + value sum), updated
    every micro-batch — the canonical custom-stateful shape: the
    aggregate never expires, so no built-in window expresses it."""

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
