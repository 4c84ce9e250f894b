"""Accuracy gates for the sketch-based (rows-only) aggregates: the SQL
oracle can't check estimates, so these pin the estimate error against
the exact answers computed in the same query."""

from __future__ import annotations

from azurestorage_blueprints_spark.queries import load_all

REGISTRY = load_all()


def test_hll_estimates_within_5_percent(spark, sf_dir):
    rows = REGISTRY["q_sketch_hll_merge"].fn(spark, sf_dir).collect()
    assert any(r.lang == "__all__" for r in rows)
    for r in rows:
        err = abs(r.est_distinct - r.exact_distinct) / max(r.exact_distinct, 1)
        assert err < 0.05, f"{r.lang}: HLL off by {err:.1%}"


def test_approx_percentile_tracks_exact(spark, sf_dir):
    rows = REGISTRY["q_approx_percentile_sketch"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in ((r.approx_p50, r.exact_p50), (r.approx_p90, r.exact_p90)):
            # approx_percentile returns a real element of the group; at
            # accuracy 1000 on these group sizes it is near-exact
            assert abs(approx - exact) / max(exact, 1) < 0.05, r


def test_count_min_overcounts_within_bound(spark, sf_dir):
    """CMS guarantees estimate >= exact, and with w=1024 counters the
    overcount is ~N/w in expectation per hash row; min over d=4 rows
    stays well under a few multiples of that."""
    from azurestorage_blueprints_spark.queries.misc_ops import _CMS_W

    rows = REGISTRY["q_sketch_count_min"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    from azurestorage_blueprints_spark.tables import table
    from azurestorage_blueprints_spark.functions.text import tokens
    from pyspark.sql import functions as F

    n_stream = (
        table(spark, sf_dir, "documents")
        .select(F.size(tokens(F.col("text"))).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    slack = 8 * n_stream / _CMS_W
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt, r
        assert r.cms_estimate - r.exact_cnt <= slack, (r, slack)
