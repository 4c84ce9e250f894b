"""Semantic gates for the round-7 eval/split/graph/screen operators —
the properties their oracles alone can't state (an oracle proves both
engines agree, not that the shared formula has the claimed property)."""

from __future__ import annotations

from azurestorage_blueprints_spark.queries import load_all

REGISTRY = load_all()


def test_kfold_balance_is_exact(spark, sf_dir):
    rows = REGISTRY["q_split_kfold_stratified"].fn(spark, sf_dir).collect()
    assert rows, "report must not be empty"
    by_lang: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.fold <= 4
        assert r.fold_spread <= 1, f"{r.lang}: fold sizes differ by {r.fold_spread}"
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert sum(x.n_docs for x in rs) == rs[0].stratum_docs, lang


def test_calibration_report_is_a_probability_decomposition(spark, sf_dir):
    rows = REGISTRY["q_eval_calibration"].fn(spark, sf_dir).collect()
    assert rows
    ece = sum(r.ece_part for r in rows)
    brier = sum(r.brier_part for r in rows)
    assert 0.0 <= ece <= 1.0
    assert 0.0 <= brier <= 1.0
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.conf <= 1.0001
        assert 0.0 <= r.acc <= 1.0
        assert r.n_pos <= r.n_docs
        # bin b covers scores [100b, 100(b+1)) (b=9 open-ended), so the
        # mean confidence must land inside the bin
        lo, hi = r.bin * 0.1, 1.001 if r.bin == 9 else (r.bin + 1) * 0.1
        assert lo - 1e-9 <= r.conf < hi + 1e-9


def test_mutual_knn_edges_are_reciprocal_top_k(spark, sf_dir):
    rows = REGISTRY["q_knn_graph_mutual"].fn(spark, sf_dir).collect()
    assert rows, "mutual graph must be non-empty at test SF"
    for r in rows:
        assert r.a_id < r.b_id
        assert 1 <= r.rank_ab <= 5 and 1 <= r.rank_ba <= 5
        assert -1.0000001 <= r.sim <= 1.0000001
    # reciprocity implies the edge set is at most k*N/2 and each node's
    # mutual degree is <= k
    deg: dict[int, int] = {}
    for r in rows:
        deg[r.a_id] = deg.get(r.a_id, 0) + 1
        deg[r.b_id] = deg.get(r.b_id, 0) + 1
    assert max(deg.values()) <= 5


def test_encoding_screen_counts_match_residue_classes(spark, sf_dir, duck):
    rows = REGISTRY["q_text_encoding_screen"].fn(spark, sf_dir).collect()
    ids = [r[0] for r in duck.execute("SELECT doc_id FROM documents").fetchall()]
    exp_bad = sum(1 for i in ids if i % 11 == 0 or i % 13 == 0)
    exp_suspect = sum(1 for i in ids if i % 7 == 0 and i % 11 != 0 and i % 13 != 0)
    exp_repl = sum(1 for i in ids if i % 13 == 0)
    exp_ctrl = 2 * sum(1 for i in ids if i % 11 == 0)
    exp_moji = sum((i % 5) + 1 for i in ids if i % 7 == 0)
    assert sum(r.n_bad for r in rows) == exp_bad
    assert sum(r.n_suspect for r in rows) == exp_suspect
    assert sum(r.total_repl for r in rows) == exp_repl
    assert sum(r.total_ctrl for r in rows) == exp_ctrl
    assert sum(r.total_moji for r in rows) == exp_moji
    assert sum(r.n_clean + r.n_suspect + r.n_bad for r in rows) == len(ids)


def test_pr_curve_is_monotone_in_recall_and_ap_is_bounded(spark, sf_dir):
    rows = REGISTRY["q_eval_pr_curve"].fn(spark, sf_dir).collect()
    assert rows
    ap = sum(r.ap_contrib for r in rows)
    assert 0.0 < ap <= 1.0
    last_recall = 0.0
    for r in rows:  # already ordered by score DESC
        assert 0.0 <= r.precision <= 1.0
        assert r.recall >= last_recall - 1e-12, "recall must be nondecreasing"
        last_recall = r.recall
        assert r.cum_tp + r.cum_fp >= r.n
    assert abs(last_recall - 1.0) < 1e-12, "lowest threshold must reach recall 1"


def test_lsh_audit_rates_are_consistent(spark, sf_dir):
    row = REGISTRY["q_dedup_lsh_recall_audit"].fn(spark, sf_dir).collect()[0]
    assert row.n_hits <= min(row.n_truth, row.n_candidates)
    assert 0.0 <= row.recall <= 1.0 and 0.0 <= row.precision <= 1.0
    assert row.n_truth > 0, "audit slice must contain true near-dups"


def test_ndcg_is_bounded_and_ideal_when_rankings_agree(spark, sf_dir):
    rows = REGISTRY["q_eval_ndcg_knn"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-12
        assert r.dcg <= 10.271924937667158 + 1e-9
        gains = [r.g1, r.g2, r.g3, r.g4, r.g5]
        assert all(0 <= g <= 5 for g in gains)
        # a gain value > 0 can appear at most once per query (one true rank each)
        pos = [g for g in gains if g > 0]
        assert len(pos) == len(set(pos))


def test_triplet_mining_report_is_consistent(spark, sf_dir):
    rows = REGISTRY["q_embed_triplet_mining"].fn(spark, sf_dir).collect()
    assert rows, "every label must mine triplets"
    for r in rows:
        assert r.n_triplets > 0
        assert r.n_pos_margin <= r.n_triplets
        assert r.min_margin_pm <= r.max_margin_pm
        assert -2000 <= r.min_margin_pm and r.max_margin_pm <= 2000
        assert 0.0 <= r.pos_margin_share <= 1.0
