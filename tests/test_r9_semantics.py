"""Semantic gates for the round-9 operators — the properties their
oracles alone can't state (an oracle proves both engines agree, not
that the shared formula has the claimed property)."""

from __future__ import annotations

from azurestorage_blueprints_spark.queries import load_all

REGISTRY = load_all()


def test_classifier_apply_counts_partition_and_agree(spark, sf_dir):
    """Per source: keep + drop = docs, rates are the exact integer
    ratios, and the corpus-wide agreement with the length label is well
    above chance — the frozen round-6 weights must SCORE like the
    trained classifier, not like noise (trained accuracy was 0.958 at
    the reference SF; cross-SF generalization keeps a wide margin)."""
    rows = REGISTRY["q_quality_classifier_apply"].fn(spark, sf_dir).collect()
    assert rows, "documents table has sources; report must not be empty"
    tot_docs = tot_agree = 0
    for r in rows:
        assert r.n_keep + r.n_drop == r.n_docs
        assert abs(r.keep_rate - r.n_keep / r.n_docs) < 1e-12
        assert abs(r.agree_rate - r.n_agree / r.n_docs) < 1e-12
        tot_docs += r.n_docs
        tot_agree += r.n_agree
    assert tot_agree / tot_docs >= 0.8, (
        f"frozen-weight agreement collapsed: {tot_agree}/{tot_docs}"
    )


def test_waterfall_classifier_stage_nests(spark, sf_dir):
    """The r9 classifier stage only ever shrinks the survivor set:
    n_after_classifier <= n_after_langid, and its retention is the
    exact ratio of the two counts."""
    r = REGISTRY["q_curation_waterfall"].fn(spark, sf_dir).first()
    assert (
        r.n_all
        >= r.n_after_c4
        >= r.n_after_gopher
        >= r.n_after_langid
        >= r.n_after_classifier
        >= 0
    )
    if r.n_after_langid:
        assert abs(
            r.classifier_retention - r.n_after_classifier / r.n_after_langid
        ) < 1e-12


def test_waterfall_classifier_stage_matches_apply_rung(spark, sf_dir):
    """Cross-rung consistency: the waterfall's classifier verdict is
    the SAME frozen-weight score as q_quality_classifier_apply's, so
    the waterfall's final survivors can never exceed the apply rung's
    total keeps (the waterfall ANDs three more filters in front)."""
    wf = REGISTRY["q_curation_waterfall"].fn(spark, sf_dir).first()
    keeps = sum(
        r.n_keep
        for r in REGISTRY["q_quality_classifier_apply"].fn(spark, sf_dir).collect()
    )
    assert wf.n_after_classifier <= keeps


def test_incremental_substring_nests_in_full_rung(spark, sf_dir):
    """For every arriving doc: its corpus-duplicated window count is
    bounded by the FULL rung's shared-window count (a window already in
    the standing corpus is shared corpus-wide by definition), and its
    window census matches the full rung's exactly."""
    from azurestorage_blueprints_spark.queries.dedup import (
        _INC_ARRIVAL_MOD,
        _INC_ARRIVAL_REM,
    )

    inc = {
        r.doc_id: r
        for r in REGISTRY["q_dedup_substring_incremental"].fn(spark, sf_dir).collect()
    }
    assert inc, "arrival split must contain >=1 windowed doc at the gate SF"
    full = {
        r.doc_id: r
        for r in REGISTRY["q_dedup_exact_substring"].fn(spark, sf_dir).collect()
    }
    arrivals_in_full = {
        d for d in full if d % _INC_ARRIVAL_MOD == _INC_ARRIVAL_REM
    }
    assert set(inc) == arrivals_in_full, "window census diverged between rungs"
    for doc_id, r in inc.items():
        f = full[doc_id]
        assert r.n_windows == f.n_windows
        assert 0 <= r.n_corpus_dup_windows <= f.n_shared_windows
        assert abs(r.corpus_dup_frac - r.n_corpus_dup_windows / r.n_windows) < 1e-12
    assert any(r.n_corpus_dup_windows > 0 for r in inc.values()), (
        "the corpus's identical-doc clusters must surface cross-split overlap"
    )


def test_embedding_lsh_audit_full_identical_recall(spark, sf_dir):
    """Planted byte-identical vector clones have signature-equal
    Hamming 0 and cosine exactly 1.0 — EVERY one must be found (the
    blocking + identical-signature rescue recall floor), and perturbed
    clones must stay within the pigeonhole cutoff when found."""
    from azurestorage_blueprints_spark.queries.dedup import _ELA_SLICE
    from azurestorage_blueprints_spark.tables import table

    rows = REGISTRY["q_dedup_embedding_lsh_audit"].fn(spark, sf_dir).collect()
    assert rows
    ident = [r for r in rows if r.pair_type == "clone_identical"]
    n_planted = table(spark, sf_dir, "embeddings").filter(
        f"vec_id < {_ELA_SLICE}"
    ).count()
    assert len(ident) == n_planted, (
        f"identical-clone recall must be total: {len(ident)}/{n_planted}"
    )
    for r in ident:
        # the sequential-fold cosine of identical vectors can land a
        # few ulp under 1.0 (dot vs nrm*nrm round differently); the
        # oracle hash-matches the exact value, the gate pins ~1
        assert r.hamming == 0 and r.sim >= 1.0 - 1e-12
    for r in rows:
        assert 0 <= r.hamming <= 3 and r.sim >= 0.8
