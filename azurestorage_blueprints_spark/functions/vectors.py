"""Vector column expressions over ``array<float>`` embeddings.

All higher-order-function based (JVM-side, no UDFs): explicit
left-folds with double accumulators so the accumulation order — and
therefore the IEEE result — is identical to the SQL oracle's
``list_reduce`` / ``list_cosine_similarity`` (verified bit-identical
against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def clamp_sim(sim: Column) -> Column:
    """Clamp a cosine similarity to [-1, 1] — DuckDB's
    ``list_cosine_similarity`` semantics. Required for cross-engine
    hash parity on IDENTICAL vector pairs: the raw fold computes
    ``S / (sqrt(S) * sqrt(S))`` which rounds to 1 + 1-2 ulp, while
    DuckDB's single-sqrt form ``S / sqrt(S*S)`` is exactly 1.0
    (``sqrt(fl(x^2)) == x`` for normal doubles). Interior values are
    untouched — verified bit-identical across 98.6k sf1 pairs (the r7
    sf1 sweep caught the overflow class: 21,735 identical-copy pairs,
    zero interior diffs)."""
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), sim))


def cosine(a: Column, b: Column) -> Column:
    """Clamped sequential-fold cosine — see :func:`clamp_sim` for why
    the clamp is part of the definition."""
    return clamp_sim(dot(a, b) / (norm(a) * norm(b)))
