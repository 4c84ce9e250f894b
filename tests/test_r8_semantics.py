"""Semantic gates for the round-8 dedup-scale operators — the
properties their oracles alone can't state (an oracle proves both
engines agree, not that the shared formula has the claimed property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries import load_all

REGISTRY = load_all()


def test_exact_substring_counts_nest(spark, sf_dir):
    """Per doc: removable (non-first) occurrences are a subset of
    shared-content occurrences, which are a subset of all windows; a
    doc with every window unique has zero in both dup columns."""
    rows = REGISTRY["q_dedup_exact_substring"].fn(spark, sf_dir).collect()
    assert rows, "corpus has 50-token docs; report must not be empty"
    assert any(r.n_dup_windows > 0 for r in rows), (
        "the corpus's identical-doc clusters must surface removable spans"
    )
    for r in rows:
        assert 0 <= r.n_dup_windows <= r.n_shared_windows <= r.n_windows
        assert abs(r.dup_frac - r.n_dup_windows / r.n_windows) < 1e-12


def test_exact_substring_finds_planted_span(spark):
    """A 50-token span copied between two otherwise-different documents
    is detected: the copy's occurrence is non-first, the source's is
    shared-but-first (ExactSubstr keeps the first occurrence)."""
    span = " ".join(f"s{i}" for i in range(50))
    docs = [
        (1, span + " " + " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30)) + " " + span),
        (3, " ".join(f"c{i}" for i in range(80))),  # no shared content
    ]
    import pandas as pd

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="xsub_fixture_")
    pdf.to_parquet(os.path.join(tmp, "documents.parquet"))
    got = {r.doc_id: r for r in REGISTRY["q_dedup_exact_substring"].fn(spark, tmp).collect()}
    assert set(got) == {1, 2, 3}
    # doc 1 holds the first occurrence of the planted span's windows:
    # shared but nothing removable
    assert got[1].n_shared_windows >= 1 and got[1].n_dup_windows == 0
    # doc 2's copy is entirely removable (exactly the span's one window
    # at W=50 — the span sits at the end, so only pos len-49 matches)
    assert got[2].n_dup_windows >= 1
    assert got[3].n_shared_windows == 0 and got[3].n_dup_windows == 0


def test_lsh_bucket_stats_is_a_partition_of_docs(spark, sf_dir):
    """Per band, bucket sizes weighted by bucket count must sum to the
    number of signed documents (each doc sits in exactly one bucket per
    band), and the candidate-pair column must be the exact pair count
    for its size class."""
    rows = REGISTRY["q_dedup_lsh_bucket_stats"].fn(spark, sf_dir).collect()
    assert rows
    from azurestorage_blueprints_spark.queries.dedup import _mhp_sig
    from azurestorage_blueprints_spark.tables import table

    n_docs = _mhp_sig(table(spark, sf_dir, "documents")).count()
    per_band: dict[int, int] = {}
    for r in rows:
        assert r.candidate_pairs == r.n_buckets * r.bucket_size * (r.bucket_size - 1) // 2
        per_band[r.band] = per_band.get(r.band, 0) + r.n_buckets * r.bucket_size
    assert set(per_band) == {0, 1, 2, 3}
    for band, total in per_band.items():
        assert total == n_docs, f"band {band}: {total} != {n_docs} docs"


def test_simhash_audit_reports_cap_cost_honestly(spark, sf_dir):
    """The audit's same-set clones have Hamming 0 by construction, so
    every found one must report hamming == 0 — and since the r9
    identical-signature rescue, EVERY planted same-set clone must be
    found (the r8 cap recall hole — 43/300 clones inside over-cap
    identical clusters never entered the pairing join — is closed;
    the gate-SF slices' largest identical cluster is 18 docs = 36
    fixture members, within _IDENT_GROUP_CAP, so full direct pairing
    is the contract, not just reachability)."""
    rows = REGISTRY["q_dedup_simhash_audit"].fn(spark, sf_dir).collect()
    assert rows
    same = [r for r in rows if r.pair_type == "clone_same_set"]
    assert same, "no same-set clone found — blocking recall collapsed"
    for r in same:
        assert r.hamming == 0
    # a one-token append may leave every vote sum's sign unchanged, so
    # hamming 0 is legal; the cutoff bound is the invariant
    one = [r for r in rows if r.pair_type == "clone_one_token"]
    for r in one:
        assert 0 <= r.hamming <= 3
    from azurestorage_blueprints_spark.tables import table

    n_planted = (
        table(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 300)
            & (F.size(F.filter(F.split("text", " "), lambda t: t != "")) > 0)
        )
        .count()
    )
    assert len(same) == n_planted, (
        f"rescue must recover every planted Hamming-0 clone: {len(same)}/{n_planted}"
    )


def test_substring_spans_are_merged_and_consistent(spark, sf_dir):
    """Span-merge invariants: every span is at least one whole window
    (>= 50 tokens), merged spans are disjoint so removable_tokens >=
    n_spans * 50, and the set of documents with spans is exactly the
    set the per-window rung reports removable windows for."""
    from azurestorage_blueprints_spark.queries.dedup import _XSUB_W

    spans = {r.doc_id: r for r in REGISTRY["q_dedup_substring_spans"].fn(spark, sf_dir).collect()}
    assert spans, "corpus has removable spans at the gate SF"
    for r in spans.values():
        assert r.n_spans >= 1
        assert r.longest_span >= _XSUB_W
        assert r.removable_tokens >= r.n_spans * _XSUB_W
        assert r.removable_tokens >= r.longest_span
    win = {r.doc_id: r for r in REGISTRY["q_dedup_exact_substring"].fn(spark, sf_dir).collect()}
    dup_docs = {d for d, r in win.items() if r.n_dup_windows > 0}
    assert set(spans) == dup_docs, "span docs != docs with removable windows"
    for d, r in spans.items():
        # a span of K consecutive windows covers K + 49 tokens, so
        # removable tokens never exceed dup windows + 49 per span
        assert r.removable_tokens <= win[d].n_dup_windows + r.n_spans * (_XSUB_W - 1)


def test_substring_spans_merge_planted_overlap(spark):
    """Two overlapping duplicated windows (a 51-token copied block =
    two 50-token windows one apart) merge into ONE 51-token span."""
    block = " ".join(f"s{i}" for i in range(51))
    docs = [
        (1, block + " " + " ".join(f"a{i}" for i in range(20))),
        (2, " ".join(f"b{i}" for i in range(20)) + " " + block),
    ]
    import os
    import tempfile

    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="xspan_fixture_")
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        os.path.join(tmp, "documents.parquet")
    )
    got = {r.doc_id: r for r in REGISTRY["q_dedup_substring_spans"].fn(spark, tmp).collect()}
    assert set(got) == {2}, "only the later copy is removable"
    assert got[2].n_spans == 1, "overlapping windows must merge into one span"
    assert got[2].removable_tokens == 51
    assert got[2].longest_span == 51


def test_quality_classifier_actually_learns(spark, sf_dir):
    """Training-loop semantics the oracle can't state: round 1 starts
    from the zero vector (every doc misclassified — margin 0 counts as
    a mistake), the trajectory ends well above chance, n_docs is
    constant, and accuracy is exactly 1 - mistakes/docs."""
    rows = sorted(
        REGISTRY["q_quality_classifier_train"].fn(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    from azurestorage_blueprints_spark.queries.curation import _PCT_ROUNDS

    assert [r.round for r in rows] == list(range(1, _PCT_ROUNDS + 1))
    assert rows[0].n_mistakes == rows[0].n_docs, "round 1 must start from w=0"
    n = rows[0].n_docs
    for r in rows:
        assert r.n_docs == n
        assert abs(r.accuracy - (1.0 - r.n_mistakes / r.n_docs)) < 1e-15
    # measured: 0.958 at sf0.01, 0.89 at the sf0.001 gate corpus — both
    # far above the 0.512 the oscillating pre-fix trajectory plateaued at
    assert rows[-1].accuracy >= 0.85, (
        f"classifier failed to learn the length rule: {rows[-1].accuracy}"
    )
    assert rows[-1].accuracy > rows[1].accuracy - 1e-12
