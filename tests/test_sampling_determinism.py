"""Determinism properties of the hash-sampling operators.

The whole point of multiplicative-hash sampling over ``rand()`` /
``TABLESAMPLE`` is that the surviving row set is a pure function of the
key — invariant under partitioning, task retries, and cluster size.
These tests pin that property locally by re-evaluating the same
predicate under different partitionings and orderings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries.sampling import _KNUTH, _hash_mod
from azurestorage_blueprints_spark.tables import table


def _sample_ids(df) -> set[int]:
    return {
        r[0]
        for r in df.filter(_hash_mod(F.col("doc_id"), 1000) < 100)
        .select("doc_id")
        .collect()
    }


def test_hash_sample_invariant_under_repartition(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    base = _sample_ids(d)
    assert base, "sample should be non-empty"
    assert _sample_ids(d.repartition(7)) == base
    assert _sample_ids(d.repartition(1)) == base
    assert _sample_ids(d.orderBy(F.desc("doc_id"))) == base


def test_split_partitions_are_disjoint_and_exhaustive(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    b = (F.col("doc_id") * F.lit(_KNUTH)) % 100
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("valid")).otherwise(F.lit("test"))
    )
    counts = {r["split"]: r["n"] for r in d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == d.count()
    assert set(counts) == {"train", "valid", "test"}
    # splits keyed by doc_id: the same id can never land in two splits
    assert d.select("doc_id").distinct().count() == d.count()


def test_exact_k_sample_is_stable(spark, sf_dir):
    d = table(spark, sf_dir, "documents")

    def draw(df):
        return [
            r[0]
            for r in df.orderBy(_hash_mod(F.col("doc_id"), 1 << 20), F.col("doc_id"))
            .limit(50)
            .select("doc_id")
            .collect()
        ]

    first = draw(d)
    assert len(first) == 50
    assert draw(d.repartition(13)) == first


def test_poisson_bootstrap_spread_matches_theory(spark, sf_dir, duck):
    """The bootstrap's entire value is its replicate spread: for
    Poisson(1) multiplicities the replicate-total sd must be
    sqrt(sum(cents^2)). A draw scheme that is affine in the key (any
    multiply-add composition) turns replicates into constant shifts of
    one sequence and collapses the spread ~37x (the r5 review finding);
    this gate fails loudly on any such regression. 32 replicates put
    ~±13% (1 sigma) noise on the ratio; the gate allows ±3 sigma."""
    import statistics

    from azurestorage_blueprints_spark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["q_sample_poisson_bootstrap"].fn(spark, sf_dir).collect()
    assert len(rows) == 32
    sd = statistics.stdev([r.est_total_cents for r in rows])
    expected = duck.execute(
        "SELECT sqrt(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) ** 2)) FROM orders"
    ).fetchone()[0]
    ratio = sd / expected
    assert 0.55 < ratio < 1.55, f"bootstrap spread degenerate or inflated: {ratio:.3f}"
    # and the mean must track the true total closely (bias << spread)
    mean = statistics.mean([r.est_total_cents for r in rows])
    true_total = duck.execute(
        "SELECT sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) FROM orders"
    ).fetchone()[0]
    assert abs(mean - true_total) / true_total < 0.02
