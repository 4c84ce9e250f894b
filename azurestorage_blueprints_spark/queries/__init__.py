"""Query registry — the engine's declared query surface.

Every operator the engine claims (SURVEY.md §2.2 and the north-star
LLM-pipeline extensions) is registered here as a named ``Query``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are SQL-expressible, a DuckDB oracle SQL string the driver
cross-checks at sf0.01. Column names are aligned on both sides because
the driver's comparator sorts columns by name before hashing.

Determinism contract (required for value-hash equality):
- order-sensitive double reductions (SUM/AVG over double) are computed
  through exact decimal arithmetic (cast→decimal→sum→cast to double)
  on BOTH sides, so partition/order differences cannot change the hash;
- per-row double arithmetic (a*b, a/b) is IEEE-deterministic and safe;
- sequential array folds (dot products) use double accumulators with
  identical fold order on both sides;
- ties in top-k / window ranks are broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from azurestorage_blueprints_spark.queries import (  # noqa: F401
        behavior,
        dedup,
        fileops,
        llm_text,
        maintenance,
        misc_ops,
        relational,
        sampling,
        similarity,
        streaming_q,
        timeseries,
        tpch_extra,
    )

    return REGISTRY
