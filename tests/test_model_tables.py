"""Persisted ANN model tables (r8 verdict task 3): the Lloyd-trained
PQ codebook and the IVF centroid tables are written once per dataset
and read by every scoring rung — these gates pin that the persisted
path is bit-identical to in-query training (score parity), that the
table is trained at most once (the write is skipped when the _SUCCESS
marker exists), and that the model path is versioned by the geometry
constants (a constant change can never read a stale model)."""

from __future__ import annotations

import os
import shutil

from azurestorage_blueprints_spark.queries.similarity import (
    _ivf_exact_centroids,
    _model_path,
    _MODEL_VERSION,
    _persisted_model,
    _pq_codebook_train,
    _pq_model,
    _pq_train,
)
from azurestorage_blueprints_spark.tables import table


def _fresh(sf_dir: str, name: str) -> str:
    """Remove any existing model table so the test exercises the
    train-and-write path first."""
    path = _model_path(sf_dir, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def test_pq_codebook_persisted_equals_in_query_training(spark, sf_dir):
    """Read-back of the persisted codebook must be BIT-IDENTICAL to
    retraining in-query: the Lloyd pass is exact (bigint cell sums) and
    parquet stores IEEE doubles exactly, so any diff means the model
    table and the training path have drifted."""
    e = table(spark, sf_dir, "embeddings")
    _fresh(sf_dir, "pq_codebook")
    persisted = _persisted_model(
        spark, sf_dir, "pq_codebook", lambda: _pq_codebook_train(e)
    )
    got = {(r.j, r.s): tuple(r.cw) for r in persisted.collect()}
    want = {(r.j, r.s): tuple(r.cw) for r in _pq_codebook_train(e).collect()}
    assert got == want, "persisted codebook diverged from in-query training"


def test_pq_model_scores_match_in_query_training(spark, sf_dir):
    """Score parity: corpus codes from the persisted-codebook path must
    equal codes from the in-query-training path — the top-k output is a
    pure function of the codes, so code parity IS score parity."""
    e = table(spark, sf_dir, "embeddings")
    cb_t, codes_t = _pq_train(e)
    cb_m, codes_m = _pq_model(spark, e, sf_dir)
    want = {(r.vec_id, r.s): r.code for r in codes_t.collect()}
    got = {(r.vec_id, r.s): r.code for r in codes_m.collect()}
    for df in (cb_t, codes_t, cb_m, codes_m):
        df.unpersist()
    assert got == want, "model-table codes diverged from in-query training"


def test_model_is_trained_once_then_read(spark, sf_dir):
    """The second load must NOT rewrite the table: the parquet files'
    mtimes are unchanged across a reload (train-once/score-many)."""
    e = table(spark, sf_dir, "embeddings")
    path = _fresh(sf_dir, "ivf_centroids_exact")
    _persisted_model(
        spark, sf_dir, "ivf_centroids_exact", lambda: _ivf_exact_centroids(e)
    ).collect()
    before = {f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)}

    def boom():
        raise AssertionError("builder must not run when the model exists")

    again = _persisted_model(spark, sf_dir, "ivf_centroids_exact", boom)
    assert again.count() > 0
    after = {f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)}
    assert before == after, "model table was rewritten on reload"


def test_model_path_is_versioned_by_geometry(sf_dir):
    """Every geometry constant must appear in the model path — bumping
    any of them orphans the old table instead of silently reusing it."""
    p = _model_path(sf_dir, "pq_codebook")
    assert _MODEL_VERSION in p
    # geometry tokens + (r10) every training-affecting constant: the
    # sample-hash recipe and the floor(x+0.5) quantizer convention
    for tok in ("K16", "D8", "QZ1000000000", "CAP4096", "SM2654435761x15", "FLQ"):
        assert tok in p, f"geometry token {tok} missing from model path"
    assert os.path.basename(os.path.normpath(sf_dir)) in p
    assert os.path.basename(os.path.dirname(p)) == "models"
