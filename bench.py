#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query executes end-to-end into the no-op sink (full computation,
no result materialization on the driver) after a warm-up of the JVM
and the parquet footer caches.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azurestorage_blueprints_spark.queries import load_all  # noqa: E402
from azurestorage_blueprints_spark.session import get_spark  # noqa: E402

#: representative cross-section: scan+agg, joins, windows, custom
#: time-series ops, dedup ladder, similarity, text analysis, JSON
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q09_product_profit",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "q_window_topk_per_group",
    "q_funnel_sequence",
    "q_cohort_retention",
    "q_sample_stratified",
    "q_ts_asof_join",
    "q_ts_session_window",
    "q_json_extract",
    "q_explode_tokens",
    "q_text_quality",
    "q_dedup_minhash_lsh",
    "q_dedup_embedding",
    "q_knn_brute_force",
    "q_knn_pandas_vectorized",
    "q_knn_int8",
    "q_pipeline_corpus_curation",
    "q_text_repetition",
    "q_decontaminate",
    "q_stats_corr",
    "q_join_prefiltered",
    "q_zorder_layout",
    "q_pagerank_fixedpoint",
    # round-3 families
    "q_ngram_lm",
    "q_market_basket",
    "q_graph_khop",
    "q_ts_multires_rollup",
    "q_attribution_first_touch",
    "q_embed_pca_power",
    # round-3 additions: data-quality gate, skyline, corpus redundancy,
    # BPE merge counting, containment dedup
    "q_dq_constraints",
    "q_skyline_2d",
    "q_source_overlap",
    "q_bpe_merge_candidates",
    "q_dedup_containment",
    # round-4 additions: hypothesis tests, declared subqueries,
    # gaps-and-islands, link prediction, Gopher filter, SemDeDup,
    # segment dedup, multimodal aHash
    "q_stats_ks_test",
    "q_gini_concentration",
    "q_subquery_exists",
    "q_gaps_islands",
    "q_graph_common_neighbors",
    "q_text_gopher_rules",
    "q_semdedup",
    "q_semdedup_hier",
    "q_dedup_segments",
    "q_multimodal_image_ahash",
    # round-5 additions: k-group ANOVA, Poisson bootstrap, degree
    # assortativity, Bloom pruning, TF-IDF cosine dedup, IVF-PQ ANN,
    # GIF codec round-trip, naive-Bayes token model
    "q_stats_anova_oneway",
    "q_sample_poisson_bootstrap",
    "q_graph_assortativity",
    "q_bloom_pruning",
    "q_dedup_tfidf_cosine",
    "q_knn_ivf_pq",
    "q_multimodal_gif_roundtrip",
    "q_naive_bayes_tokens",
    "q_text_rake_keywords",
    "q_embed_outliers",
    # round-6 additions: nonparametric/rank statistics, randomization
    # inference, BSP connected components, radius search, feature
    # hashing, and the real-codec JPEG/WAV-frame multimodal tier
    "q_stats_mann_whitney",
    "q_stats_kendall_tau",
    "q_stats_levene_bf",
    "q_stats_permutation_test",
    "q_graph_components_minlabel",
    "q_knn_range_search",
    "q_text_feature_hashing",
    "q_multimodal_wav_frame_energy",
    "q_multimodal_jpeg_roundtrip",
    # round-7 additions: BPE vocabulary induction, incremental
    # batch-vs-corpus dedup, HTML extraction + boilerplate filter,
    # calibration eval, mutual-kNN graph, encoding screen, k-fold split
    "q_bpe_train",
    "q_dedup_incremental",
    "q_html_extract_text",
    "q_eval_calibration",
    "q_knn_graph_mutual",
    "q_text_encoding_screen",
    "q_split_kfold_stratified",
    "q_ts_seasonal_decompose",
    "q_eval_pr_curve",
    "q_fileops_sync_diff",
    "q_dedup_lsh_recall_audit",
    "q_eval_ndcg_knn",
    "q_embed_triplet_mining",
    "q_stats_cramers_v",
    "q_multimodal_wav_zcr",
    "q_mixture_drift_tv",
    "q_kmeans_train",
    # round-8 additions: exact substring dedup, LSH occupancy audit,
    # simhash clone audit, and the re-geometried simhash rung itself
    # (64-bit, occupancy-capped — its bench number tracks the pairing
    # join the r7 verdict flagged)
    "q_dedup_exact_substring",
    "q_dedup_substring_spans",
    "q_dedup_lsh_bucket_stats",
    "q_dedup_simhash_audit",
    "q_dedup_simhash",
    # round-8: the arithmetic-JPEG (Annex D QM-coder) equivalence gate
    # and the quality-classifier training loop
    "q_multimodal_jpeg_arith",
    "q_quality_classifier_train",
    # round-9 additions: the classifier APPLY rung (train-once/
    # score-many scoring pass), incremental ExactSubstr (arrival-batch
    # window overlap vs the standing corpus), and q_knn_pq now that it
    # reads the persisted codebook (its bench number tracks pure
    # encode+ADC scoring cost next to q_knn_ivf_pq's)
    "q_quality_classifier_apply",
    "q_dedup_substring_incremental",
    "q_knn_pq",
    "q_dedup_embedding_lsh",
    "q_dedup_embedding_lsh_audit",
    "q_knn_pq_codebook",
    "q_knn_model_drift",
    "q_knn_nprobe_tradeoff",
    "q_stream_ann_serving",
    "q_stream_model_drift",
    "q_graph_label_propagation",
    "q_knn_ivf_partitioned",
    "q_decontaminate_fuzzy",
    # round-10 addition: CCNet perplexity terciles (per-language unigram
    # LM + ntile cuts — its bench number tracks the token-stream rejoin
    # and the per-language window next to the row-local curation rungs)
    "q_ccnet_perplexity_buckets",
    # round-10: the ingest-time form — frozen LM + tercile thresholds on
    # a broadcast constants table, row-local fold, one complete-mode agg
    # (its bench number is dominated by the 4-micro-batch replay)
    "q_stream_perplexity_gate",
    # round-10: PMI collocations (two count hash-aggs + vocab-sized
    # broadcast rejoin + top-k)
    "q_pmi_collocations",
    # round-10: the two O(1)-output planners (curriculum mix schedule,
    # length-bucket padding economics) — cheap by design; their bench
    # numbers pin the scan+agg floor of the planning tier
    "q_mixture_curriculum",
    "q_batch_length_buckets",
    # round-10: the DSIR family — batch importance scoring (one training
    # scan + one broadcast-model scoring scan), Gumbel-top-k selection
    # (same plan + TakeOrderedAndProject), and the ingest-time gate
    # (frozen literal-map model, 4-micro-batch replay)
    "q_dsir_importance",
    "q_dsir_resample",
    "q_stream_dsir_gate",
    # round-10: DoReMi excess-loss mixture step (one (source,token)
    # hash-agg + vocab x vocab CE join) and the k-anonymity screen
    # (QI-domain-bounded agg — pins the governance-tier floor)
    "q_mixture_doremi_step",
    "q_k_anonymity",
    # round-10: the dimension axis of the ANN cost/recall surface (one
    # scored pass, 4 prefix widths — tracks the brute-force pair loop)
    "q_knn_dim_truncation",
    # round-10: filtered ANN (one scored pass, two ranking legs) and the
    # Zipf corpus-health line (vocab agg + bounded head window)
    "q_knn_filtered_search",
    "q_zipf_fit",
    # round-10 closing batch: doc entropy ((doc, token) agg), video
    # scene cuts (full-frame decode + lead window), DP release +
    # langid margin + temporal split (cheap O(groups) projections),
    # MinHash calibration (candidate pairs + posting intersection),
    # k-core (5 checkpointed peel rounds — the iterative-tier number)
    "q_text_unigram_entropy",
    "q_multimodal_video_scene_cuts",
    "q_dp_noisy_counts",
    "q_text_langid_margin",
    "q_split_temporal",
    "q_dedup_minhash_calibration",
    "q_graph_kcore",
    # round-10: the multimodal ingest gate (4-micro-batch replay +
    # Arrow-batched decode — tracks the streaming-tier floor) and the
    # erasure gate (stream-static probe — the cheapest streaming rung)
    "q_stream_multimodal_gate",
    "q_stream_forget_gate",
    # round-11: the LM ladder rung (KN bigram held-out perplexity),
    # the cap-aware mixture planner, the trained-classifier calibration
    # instrument, the span-corruption planner (pure in-array scan),
    # centered PCA with variance share, the Markov stationary vector,
    # and the split-conformal coverage report
    "q_kn_bigram_perplexity",
    "q_mixture_unimax",
    "q_quality_calibration",
    "q_span_corruption_plan",
    "q_embed_pca_var_share",
    "q_markov_stationary",
    "q_conformal_ppl_coverage",
    "q_embed_psi_drift",
    "q_stream_conformal_gate",
    # round-12: exact distributed quantiles (two-phase histogram
    # selection generalized out of the CCNet family — per-group and
    # the degenerate global case; their bench numbers pin the
    # selection machinery's relational floor)
    "q_quantiles_exact",
    "q_quantiles_global",
    # round-12: the 11th ingest gate — frozen exact-p95 thresholds
    # (two-phase selection pre-pass) metered against arrivals
    "q_stream_quantile_gate",
    # round-12: row-local JL 64->16 sign projection + exact-int
    # distortion audit, and the eval family's clipped n-gram overlap
    # (ROUGE-2) kernel — both pure map + equi-join shapes
    "q_embed_jl_projection",
    "q_eval_rouge_n",
    # r12 second batch: community quality over the LPA partition,
    # greedy k-center diversity sampling (8 broadcast rounds), the
    # Hilbert layout key (8 chained row-local projections), and the
    # t-closeness release screen (domain-bounded grid aggs)
    "q_graph_modularity",
    "q_kcenter_sample",
    "q_hilbert_layout",
    "q_t_closeness",
    # r12 third batch: corpus BLEU (pooled clipped-overlap + brevity),
    # Kaplan-Meier with right-censoring (histogram-ride windows), and
    # the 12th ingest gate (benchmark 5-gram decontamination)
    "q_eval_bleu",
    "q_survival_km",
    "q_stream_decontamination_gate",
    # r12 fourth batch: paired-classifier McNemar over two row-local
    # language-ID classifiers (one scan, one O(langs) agg)
    "q_eval_mcnemar",
    # r12 fifth batch: HITS fixed-point (6th oracle-checked iterative
    # algorithm) and the BMP (no-compression DIB) codec tier
    "q_graph_hits",
    "q_multimodal_bmp_roundtrip",
    # r12 sixth batch: exact DTW (28 chained row-local DP folds) and
    # isotonic calibration (minimax over the checkpointed bin table)
    "q_ts_dtw",
    "q_eval_isotonic",
    # r12 seventh batch: hybrid-retrieval reciprocal-rank fusion (both
    # legs end in TakeOrderedAndProject; fusion is a 50x50 join)
    "q_retrieval_rrf",
    # r12 eighth batch: percentile-bootstrap CI for the exact median —
    # two fused x33 mixer passes (histogram cut, then boundary-bin
    # sliver behind a broadcast bounds join; r12 optimization round 1
    # retired both the checkpointed corpus-derived histogram and the
    # janino 64 KB interpreted fallback — see SCALING.md)
    "q_quantile_bootstrap_ci",
]


def run_query(df) -> None:
    """Force full execution without driver-side materialization."""
    df.write.mode("overwrite").format("noop").save()


def _gc(spark) -> None:
    """Collect dead JVM refs at the query boundary.

    clearCache alone leaves localCheckpoint blocks (iterative graph
    queries) and broadcast remnants pinned until the driver happens to
    GC — across ~70 queries that accumulation degraded late-sequence
    mapInPandas queries 3x (measured 1.3 → 4.5 s) and inflated the
    next query's spread. An explicit System.gc() between QUERIES lets
    Spark's ContextCleaner release them — the same mechanism as
    spark.cleaner.periodicGC, applied at measurement boundaries. It
    must NOT run between a query's timed samples: a full GC flushes
    JITed code and the recompilation bleeds into the next sample.

    The GC also QUEUES the actual cleanup: ContextCleaner drains the
    reference queue asynchronously, and after ~60 queries the drain
    storm (thousands of accumulator/broadcast/shuffle removals, with
    "non-existent accumulator" errors from in-flight tasks) lands in
    the NEXT query's timed window — the mechanism behind the
    position-dependent 3-5x degradation of whichever query ran late
    in the sequence. The short sleep lets the drain finish inside
    UNTIMED wall clock."""
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.5)


#: timed executions per query; the reported number is the MEDIAN so a
#: single environmental spike (GC pause, noisy neighbor, page-cache
#: miss) cannot dominate a round-over-round delta (r4 verdict item 6 —
#: two 10x "regressions" on unchanged code were single-run artifacts).
#: The min/max spread is carried in the artifact so outliers are visible.
RUNS_PER_QUERY = 3

#: per-query sample-count overrides: rungs whose short-session number
#: sits in a wide session-position band get more samples so the median
#: is stable round-over-round (r7 verdict task 5: q_knn_ivf_pq's
#: documented 4.5-6.5 s band made it the suite's noisiest headline —
#: 7 samples tighten the median's sampling spread to well under the
#: ±15% target).
EXTRA_RUNS = {
    "q_knn_ivf_pq": 7,
    # r9 verdict task 5: both ExactSubstr rungs sat at the TOP of their
    # documented 1.3-2.2 s two-session envelope for two driver rounds in
    # a row. A controlled 5-run A/B this round measured medians of 1.27 /
    # 1.24 s (min 1.06 / 1.12) with the r9 code - the 2.2 s rows were
    # session-position noise, not the 2^32 key-shift change (same
    # multiply, same plan). Pin them at median-of-7 unconditionally so
    # the quoted number stays inside the envelope regardless of where
    # the suite schedules them.
    "q_dedup_exact_substring": 7,
    "q_dedup_substring_spans": 7,
}

#: adaptive generalization of EXTRA_RUNS (r8 verdict task 7): ANY rung
#: whose first RUNS_PER_QUERY samples have a median at or above this
#: threshold continues to LONG_RUNS samples — the expensive rungs are
#: exactly where session-position noise moves absolute seconds, so
#: they all get the median-of-7 treatment, not just the one that was
#: flagged. Cheap rungs keep 3 samples (7 would stretch the suite for
#: no precision gain on sub-second medians).
ADAPTIVE_THRESH_SEC = 2.0
LONG_RUNS = 7

#: stall-noise trigger (r10 verdict task 6): the committed artifact
#: carried 2-3 GC/compaction stall outlier MEDIANS per run (different
#: queries each time, floors stable across five characterized runs).
#: A median more than 1.5x its own min inside one session is the stall
#: signature, not a plan property — ANY rung that shows it re-runs at
#: median-of-7 regardless of absolute cost (the >=2 s rule alone let
#: sub-2 s rungs commit stall medians), and escalates once more to
#: median-of-11 if the stalls persist, so committed medians converge
#: to floors instead of sampling the stall band.
ADAPTIVE_STALL_RATIO = 1.5
MAX_RUNS = 11


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    registry = load_all()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        # per-query warm-up: whole-stage codegen compiles once per plan
        # (JIT + parquet footers on the first pass); the timed passes
        # measure steady-state execution, which is what scales — the
        # one-time compile amortizes to zero on a real workload.
        # catalog.clearCache() between executions is the per-query
        # teardown: a query that persists an intermediate must never
        # leave it pinned into the next query's unified-memory budget
        # (and re-caching the warm-up's plan is what produced the
        # CacheManager "already cached" warnings in r4's tail).
        # Failures are isolated per query: one broken plan must not
        # erase the benchmark line for the other queries.
        try:
            run_query(registry[name].fn(spark, sf_dir))
            spark.catalog.clearCache()
            samples = []
            n_runs = EXTRA_RUNS.get(name, RUNS_PER_QUERY)
            while len(samples) < n_runs:
                t0 = time.perf_counter()
                run_query(registry[name].fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                # adaptive extension (r8 verdict task 7 + r10 task 6):
                # once the base samples are in, a rung widens to
                # LONG_RUNS if it is expensive (>=2 s median) OR shows
                # the stall signature (median > 1.5x its own min), and
                # to MAX_RUNS if the stall signature survives 7 samples
                if len(samples) == n_runs and n_runs < MAX_RUNS:
                    med = sorted(samples)[len(samples) // 2]
                    stalled = med > ADAPTIVE_STALL_RATIO * min(samples)
                    if n_runs < LONG_RUNS and (
                        med >= ADAPTIVE_THRESH_SEC or stalled
                    ):
                        n_runs = LONG_RUNS
                    elif n_runs == LONG_RUNS and stalled:
                        n_runs = MAX_RUNS
            # JVM-state reset at the QUERY boundary only: a System.gc()
            # between timed runs flushes JITed code and the deopt bleeds
            # into the next sample (measured +10 s across the suite);
            # at the boundary the next query's warm-up re-warms the JIT
            # while dead checkpoint blocks / broadcast remnants still
            # get released before its timed runs begin.
            _gc(spark)
            samples.sort()
            timings[name] = round(samples[len(samples) // 2], 3)
            spread[name] = [round(samples[0], 3), round(samples[-1], 3)]
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    for line in emit_lines(timings, spread, errors, sf):
        print(line)


_B36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def abbrev(name: str) -> str:
    """Compact-line key: the committed key-manifest scheme (r12) — each
    HEADLINE query's key is its position in base36 (1-2 chars at up to
    1296 queries), decoded via BENCH_KEYS.json, which tests gate to
    stay in sync with HEADLINE. History: name-derived abbreviations
    were squeezed from 3 to 2 chars per token through r10-r11 and ran
    out of tail-window headroom at 135 queries; positional keys cut
    the per-query cost to <= 2 chars and bought room for the per-run
    contention diagnostics the r11 driver artifact lacked (its single
    contended run read as a 39% regression until hand-checked against
    local medians)."""
    i = HEADLINE.index(name)
    if i < 36:
        return _B36[i]
    return _B36[i // 36] + _B36[i % 36]


def emit_lines(
    timings: dict[str, float],
    spread: dict[str, list[float]],
    errors: dict[str, str],
    sf: float,
) -> list[str]:
    """Build the two output lines (full artifact + tail-survivable
    compact summary). Factored out so tests/test_bench_output.py can
    pin the truncation contract without running the benchmark."""
    # a partial sum is NOT comparable across rounds: with any error
    # the headline value is withheld (null) so a broken query can
    # never make a round look faster; per-query timings remain for
    # apples-to-apples comparison on the surviving set
    value = round(sum(timings.values()), 3) if not errors else None
    out = {
        # bulky diagnostics (spread, errors) come FIRST: the driver
        # preserves only the TAIL of stdout, so the headline value and
        # the median queries dict must be the last bytes printed
        # (r5 verdict "What's wrong" #2 — BENCH_r05.json lost its own
        # headline to front-truncation).
        "spread": spread,
        **({"errors": errors} if errors else {}),
        "metric": "headline_queries_total_wall_seconds",
        "runs_per_query": RUNS_PER_QUERY,
        "n_total": len(HEADLINE),
        "n_ok": len(timings),
        "unit": "sec",
        "sf": sf,
        "queries": timings,
        "value": value,
    }
    # second, compact, tail-survivable summary line: no per-query
    # spread/errors, 1-decimal medians, positional BENCH_KEYS keys,
    # queries first and the total LAST — so even a front-truncated
    # tail still ends with the headline value; must fit the driver's
    # 2000-char tail window at the full headline count (gated in
    # tests/test_bench_output.py). The full artifact line keeps the
    # exact registry names.
    #
    # contention self-identification (r12, r11 verdict task 3): the
    # r11 driver artifact was a single contended run — uniform ~1.29x
    # elevation across unrelated queries — and could only be diagnosed
    # by hand against committed local medians. The compact line now
    # carries the med/min ratio percentiles ("sprd": r50/r90/max over
    # all queries) and the worst stalled rungs ("stall": up to 8
    # [key, min, med] with med > 1.3x min). A quiet box reads r50 ~ 1.0
    # and an empty stall list; box contention self-identifies as a
    # uniformly elevated r50 in the artifact itself.
    ratios = sorted(
        timings[k] / spread[k][0]
        for k in timings
        if k in spread and spread[k][0] > 0
    )
    sprd = (
        {
            "r50": round(ratios[len(ratios) // 2], 2),
            "r90": round(ratios[(len(ratios) * 9) // 10], 2),
            "max": round(ratios[-1], 2),
        }
        if ratios
        else {}
    )
    stalled = sorted(
        (
            (timings[k] / spread[k][0], k)
            for k in timings
            if k in spread and spread[k][0] > 0 and timings[k] > 1.3 * spread[k][0]
        ),
        reverse=True,
    )[:8]
    compact = {
        "queries": {abbrev(k): round(v, 1) for k, v in timings.items()},
        "sprd": sprd,
        "stall": {abbrev(k): [spread[k][0], round(timings[k], 1)] for _, k in stalled},
        "sf": sf,
        "n_ok": len(timings),
        "value": value,
    }
    return [json.dumps(out), json.dumps(compact, separators=(",", ":"))]


if __name__ == "__main__":
    main()
