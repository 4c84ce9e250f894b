"""Skew mitigation: deterministic salted joins.

AQE's skew-join splitting (on in the engine session) handles most
skew at runtime; salting is the explicit, planner-independent tool for
the pathological case — a join key with a handful of hot values (the
100 TB classic: joining events to a dimension keyed by a low-
cardinality attribute, where one key owns half the table).

Mechanics: the big side gets a DETERMINISTIC salt in [0, n) derived by
hashing a unique column (``F.rand()`` would break retry/replay
determinism — a retried task must salt identically); the small side is
exploded n-fold with every salt value; the join key becomes
(key, salt), spreading each hot key over n shuffle partitions. Results
are identical to the unsalted join — only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    salt_by: str | Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on key column(s) ``on``, salted ``n_salt``
    ways. ``salt_by`` must be a (near-)unique column of the big side so
    the salt distributes each hot key evenly."""
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = F.col(salt_by) if isinstance(salt_by, str) else salt_by
    big_s = big.withColumn(SALT_COL, F.pmod(F.hash(salt_src), F.lit(n_salt)))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = big_s.join(small_s, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)
