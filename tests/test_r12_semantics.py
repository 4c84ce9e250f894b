"""Round-12 semantic gates — invariants behind this round's scale fixes
(r11 verdict "What's wrong" #1-#2 + ADVICE):

- the windowless top-V selection (_topv_keep, the two-phase histogram
  cut) must reproduce the row_number() top-V set EXACTLY, including
  count ties at the cut and languages whose vocab is at or under the
  cap — the equivalence proof the capped-LM re-plan rests on;
- the capped-LM pre-pass must stay windowless at the source level and
  its selection plan must never partition a Window by the constant-
  cardinality lang key alone;
- the span-corruption start hash must compute its position term in
  64-bit (the silent int32 wrap on >53k-token documents, r11 ADVICE);
- the milli-nat accumulators (DoReMi ce_*, DSIR imp_*) must stay
  inside int64 at the ADVERTISED 100 TB token scale — a bound proof,
  not a doc note (r11 verdict "What's wrong" #2).
"""

from __future__ import annotations

import inspect
import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.queries import load_all
from azurestorage_blueprints_spark.tables import table

REGISTRY = load_all()


def _plan_of(spark, df) -> str:
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def _standing_vocab(spark, sf_dir):
    from azurestorage_blueprints_spark.functions.text import tokens

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
    tok = d.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
    return tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


def test_topv_keep_matches_rownumber_on_real_vocab(spark, sf_dir):
    """The two-phase histogram cut must select the SAME top-V set as
    the retired row_number() window on the gates' actual vocab table."""
    from azurestorage_blueprints_spark.queries.streaming_q import (
        _PPL_LM_TOPV,
        _topv_keep,
    )

    s = _standing_vocab(spark, sf_dir)
    got = {
        (r.lang, r.token)
        for r in _topv_keep(s, _PPL_LM_TOPV).select("lang", "token").collect()
    }
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.col("token").asc())
    want = {
        (r.lang, r.token)
        for r in s.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") <= _PPL_LM_TOPV)
        .select("lang", "token")
        .collect()
    }
    assert got == want
    # the cap must bind (vocab > V_cap) so the cut path is exercised
    assert len(got) < s.count()


def test_topv_keep_adversarial_cases(spark):
    """Crafted worst cases: all-ties (single-bin degenerate, token-asc
    tiebreak at the cut), ties exactly at the cut rank, vocab below /
    exactly at the cap — each checked against a plain Python sort."""
    from azurestorage_blueprints_spark.queries.streaming_q import _topv_keep

    cases = {
        # all counts equal: one histogram bin, residual rank resolves
        # the whole cut inside it by token order
        "ties": [("a", f"t{i:02d}", 7) for i in range(10)],
        # counts tied exactly at the cut rank (k=3 falls mid-tie)
        "cut_tie": [("a", "w", 9), ("a", "x", 5), ("a", "y", 5), ("a", "z", 5)],
        # vocab smaller than k: no boundary bin, keep everything
        "small": [("a", "x", 3), ("a", "y", 1)],
        # vocab exactly k: boundary bin at the last token
        "exact": [("a", "x", 3), ("a", "y", 2), ("a", "z", 1)],
        # two languages, one above and one below the cap
        "mixed": [("a", f"t{i}", i + 1) for i in range(8)]
        + [("b", "u", 2), ("b", "v", 1)],
    }
    k = 3
    for name, rows in cases.items():
        s = spark.createDataFrame(rows, "lang string, token string, c bigint")
        got = {(r.lang, r.token) for r in _topv_keep(s, k).collect()}
        want = set()
        bylang: dict[str, list] = {}
        for lang, tok, c in rows:
            bylang.setdefault(lang, []).append((tok, c))
        for lang, toks in bylang.items():
            toks.sort(key=lambda t: (-t[1], t[0]))
            want |= {(lang, t) for t, _ in toks[:k]}
        assert got == want, f"case {name}: {got} != {want}"


def test_capped_lm_prepass_is_windowless_at_source():
    """Source-level pin (the r11 broadcast-allowlist convention): the
    pre-pass must route its top-V selection through _topv_keep and
    carry no window of its own."""
    from azurestorage_blueprints_spark.queries import streaming_q as m

    src = inspect.getsource(m._capped_lm_parts)
    assert "_topv_keep" in src
    assert "row_number" not in src and "Window" not in src


def test_topv_selection_plan_has_no_lang_only_window(spark, sf_dir):
    """The selection's physical plan may window only over (lang, cbin)
    — the O(langs x bins) histogram running count and the boundary-bin
    residual rank — never over lang alone (the 5-partition vocab
    sort the re-plan retires)."""
    from azurestorage_blueprints_spark.queries.streaming_q import _topv_keep

    s = _standing_vocab(spark, sf_dir)
    plan = _plan_of(spark, _topv_keep(s, 5))
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert len(specs) >= 2, "expected the two bounded windows in the plan"
    for spec in specs:
        if "lang" in spec:
            assert "cbin" in spec, f"lang-only vocab window survived: {spec}"


def test_span_start_hash_is_64bit_on_long_documents(spark):
    """The (doc_id, pos) start hash must match a pure-Python 64-bit
    mirror out past the int32 wrap point (~53k tokens: j * 40503
    crosses 2^31) — r11 ADVICE: Spark wrapped silently in IntegerType
    where DuckDB computed 64-bit."""
    from azurestorage_blueprints_spark.queries.curation import (
        _SPAN_START_MOD,
        _span_start,
    )

    doc_id = 987654321
    n = 60_000
    df = spark.createDataFrame([(doc_id,)], "doc_id bigint")
    starts = df.select(
        F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda j: F.when(_span_start(j), 1).otherwise(0),
        ).alias("m")
    ).first()[0]
    want = [
        1
        if ((doc_id % 2147483648) * 2654435761 + j * 40503)
        % 2147483648
        % _SPAN_START_MOD
        == 0
        else 0
        for j in range(1, n + 1)
    ]
    assert starts == want
    # the tail past the wrap point must still produce some starts
    assert sum(want[53_021:]) > 0, "fixture never crosses the wrap point"


def test_milli_nat_accumulators_fit_int64_at_100tb():
    """Bound proof for the r12 milli-nat rescale: at the advertised
    scale (100 TB of text ~ 2.5e13 tokens) every DoReMi/DSIR bigint
    accumulator stays inside signed int64 — Spark wraps silently where
    DuckDB raises, so the bound must hold by arithmetic, not luck."""
    import math

    I64 = 2**63
    n_tokens = 2.5e13  # ~100 TB at ~4 bytes/token
    # DoReMi: ce_*_milli = sum over token types of c * smilli, with
    # smilli <= round(ln(n + v) * 1000) and sum(c) <= n per source
    s_max = round(math.log(2 * n_tokens) * 1000)
    assert n_tokens * s_max < I64 / 10, "DoReMi ce ceiling under 10% of int64"
    # per-term products also stay exact: c <= n, smilli <= s_max
    assert n_tokens * s_max < 2**62
    # DSIR: |lr_milli| <= round((ln(n + B) - ln(1)) * 1000); the gate's
    # imp_total_milli sums one lr per FEATURE (= token) across the
    # whole arrival slice
    lr_max = round(math.log(n_tokens + 256) * 1000)
    assert n_tokens * lr_max < I64 / 10, "DSIR imp ceiling under 10% of int64"
    # Gumbel keys share the milli units: |log w| + |gumbel| per doc,
    # gumbel quantile bounded by ~40 nats at any float precision
    assert (n_tokens * lr_max) + 40_000 < I64


def test_doremi_and_dsir_sources_state_no_sub100tb_ceiling():
    """The in-plan docs must no longer state an int64 ceiling BELOW the
    100 TB corpus scale (the r11 accepted-remedy doc notes are retired
    by the rescale)."""
    from azurestorage_blueprints_spark.queries import corpus_ops, streaming_q

    for m in (corpus_ops, streaming_q):
        src = inspect.getsource(m)
        assert "2.6e11" not in src, f"{m.__name__} still quotes the micro ceiling"


def test_exact_group_quantiles_match_window_reference(spark, sf_dir):
    """The generalized two-phase selection (operators/selection.py)
    must reproduce the rank-window reference exactly on real data —
    the equivalence the q_quantiles_exact rung rests on."""
    from azurestorage_blueprints_spark.operators.selection import (
        exact_group_quantiles,
    )

    o = table(spark, sf_dir, "orders")
    ks = [
        lambda n: F.ceil(n * F.lit(0.5)).cast("bigint"),
        lambda n: F.ceil(n * F.lit(0.99)).cast("bigint"),
    ]
    got = {
        r.o_orderpriority: r
        for r in exact_group_quantiles(
            o, "o_orderpriority", "o_totalprice", "o_orderkey", ks
        ).collect()
    }
    rows = sorted(
        o.select("o_orderpriority", "o_totalprice", "o_orderkey").collect(),
        key=lambda r: (r.o_orderpriority, r.o_totalprice, r.o_orderkey),
    )
    bygrp: dict[str, list] = {}
    for r in rows:
        bygrp.setdefault(r.o_orderpriority, []).append(r)
    assert sorted(bygrp) == sorted(got)
    for grp, rs in bygrp.items():
        n = len(rs)
        g = got[grp]
        assert g.n == n
        import math

        for qi, frac in ((1, 0.5), (2, 0.99)):
            k = math.ceil(n * frac)
            want = rs[k - 1]
            assert getattr(g, f"q{qi}") == want.o_totalprice, (grp, qi)
            assert getattr(g, f"q{qi}_key") == want.o_orderkey, (grp, qi)


def test_exact_group_quantiles_adversarial_cases(spark):
    """Crafted worst cases: all-ties (single bin), ties exactly at the
    rank, singleton groups, mixed group sizes."""
    from azurestorage_blueprints_spark.operators.selection import (
        exact_group_quantiles,
    )

    cases = {
        "ties": [("a", 7.0, i) for i in range(9)],
        "cut_tie": [("a", 1.0, 1), ("a", 2.0, 2), ("a", 2.0, 3), ("a", 9.0, 4)],
        "singleton": [("a", 3.5, 1)],
        "mixed": [("a", float(i + 1), i) for i in range(10)]
        + [("b", 2.0, 11), ("b", 1.0, 12)],
    }
    ks = [
        lambda n: F.ceil(n * F.lit(0.5)).cast("bigint"),
        lambda n: n.cast("bigint"),  # the max — boundary bin is the last
    ]
    import math

    for name, rows in cases.items():
        df = spark.createDataFrame(rows, "g string, v double, k bigint")
        got = {r.g: r for r in exact_group_quantiles(df, "g", "v", "k", ks).collect()}
        bygrp: dict[str, list] = {}
        for g, v, k in rows:
            bygrp.setdefault(g, []).append((v, k))
        for g, vs in bygrp.items():
            vs.sort()
            n = len(vs)
            r = got[g]
            assert r.n == n, name
            k1 = math.ceil(n * 0.5)
            assert (r.q1, r.q1_key) == vs[k1 - 1], (name, g)
            assert (r.q2, r.q2_key) == vs[n - 1], (name, g)


def test_exact_group_quantiles_plan_windows_ride_the_histogram(spark, sf_dir):
    """No Window in the selection plan may partition by the group key
    without the histogram bin — the constant-key corpus sort this
    operator exists to avoid."""
    from azurestorage_blueprints_spark.operators.selection import (
        exact_group_quantiles,
    )

    o = table(spark, sf_dir, "orders")
    df = exact_group_quantiles(
        o,
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        [lambda n: F.ceil(n * F.lit(0.5)).cast("bigint")],
    )
    plan = _plan_of(spark, df)
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert len(specs) >= 2
    for spec in specs:
        if "o_orderpriority" in spec:
            assert "_qbin" in spec or "_cnt" in spec, (
                f"group-only corpus window survived: {spec}"
            )


def test_exact_group_quantiles_rescan_is_a_sliver(spark, sf_dir):
    """Scale posture of the two-phase selection: phase 2 re-scans ONLY
    the boundary bins, an expected ~len(ks)/bins slice of the corpus.
    Gate the realized fraction on real data so a binning regression
    (too-coarse bins -> phase 2 degrades toward the full sort this
    operator exists to avoid) fails loudly."""
    from azurestorage_blueprints_spark.operators.selection import log_bin

    o = table(spark, sf_dir, "orders")
    binc = log_bin(F.col("o_totalprice"))
    hist = o.groupBy("o_orderpriority", binc.alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n_rows = o.count()
    n_bins = hist.count()
    # hundreds of distinct milli-log bins per group on real prices
    assert n_bins / 5 > 100, f"binning collapsed to {n_bins} bins"
    # worst single bin (any boundary bin's rescan cost) stays a sliver
    worst = hist.agg(F.max("c")).first()[0]
    assert worst / n_rows < 0.05, (
        f"largest bin holds {worst}/{n_rows} rows — phase 2 would rescan "
        "a material corpus share"
    )


def test_global_quantiles_degenerate_case_plan_and_values(spark, sf_dir):
    """The single-group (constant-key) case is where the naive exact
    plan is worst — an empty-partitionBy window sorts the whole corpus
    in ONE task. The selection plan must keep every window on the
    histogram, and the values must equal a driver-side sorted
    reference."""
    out = REGISTRY["q_quantiles_global"].fn(spark, sf_dir)
    plan = _plan_of(spark, out)
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs
    for spec in specs:
        assert "_qbin" in spec or "_cnt" in spec, (
            f"corpus-scale window in the global-quantile plan: {spec}"
        )
    li = sorted(
        (r.l_extendedprice, r.l_orderkey * 8 + r.l_linenumber)
        for r in table(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_orderkey", "l_linenumber")
        .collect()
    )
    import math

    r = out.first()
    n = len(li)
    assert r.n == n
    for qi, frac in ((1, 0.5), (2, 0.99), (3, 0.999)):
        k = math.ceil(n * frac)
        assert (getattr(r, f"q{qi}"), getattr(r, f"q{qi}_key")) == li[k - 1], qi


def test_quantile_gate_funnel_accounts_for_every_arrival(spark, sf_dir):
    """Every arriving document lands in exactly one (lang, over_p95)
    cell, and the realized over-p95 share sits near the 5% the frozen
    threshold was calibrated to (the split reuses one distribution)."""
    funnel = REGISTRY["q_stream_quantile_gate"].fn(spark, sf_dir).collect()
    assert all(r.over_p95 in (0, 1) for r in funnel)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    arrivals = {
        r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got: dict[str, int] = {}
    over = total = 0
    for r in funnel:
        got[r.lang] = got.get(r.lang, 0) + int(r.n_docs)
        total += r.n_docs
        if r.over_p95 == 1:
            over += r.n_docs
        assert r.chars_total >= r.n_docs >= 1 and r.max_chars >= 1
    assert got == arrivals
    assert 0.0 <= over / total < 0.25, f"p95 gate flagged {over}/{total}"


def test_jl_projection_matches_exact_python_recompute(spark, sf_dir):
    """The JL rung's per-label report must equal an independent exact
    integer recomputation of quantize -> sign-project -> pair ->
    milli-ratio in plain Python — pinning the masked-hash sign matrix,
    the int8 quantization, and the floor-division milli convention all
    at once (the oracle twin re-proves this cross-engine; this gate
    proves it against the DEFINITION)."""
    import math

    K, HMOD = 16, 2147483648
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    byid = {}
    for r in rows:
        xs = [float(x) for x in r.embedding]
        scale = max(max(abs(x) for x in xs), 1e-12)
        v = [math.floor(x * 127.0 / scale + 0.5) for x in xs]
        y = [
            sum(
                v[i]
                * (
                    1
                    - 2
                    * (((i * K + j + 1) * 2654435761) % HMOD // 32768 % 2)
                )
                for i in range(len(v))
            )
            for j in range(K)
        ]
        byid[r.vec_id] = (int(r.label), v, y)
    expect: dict[int, list[int]] = {}
    for a in sorted(byid):
        if a % 2 or (a + 1) not in byid:
            continue
        la, va, ya = byid[a]
        _, vb, yb = byid[a + 1]
        d2o = sum((p - q) ** 2 for p, q in zip(va, vb))
        d2p = sum((p - q) ** 2 for p, q in zip(ya, yb))
        if d2o > 0:
            expect.setdefault(la, []).append((d2p * 1000) // (K * d2o))
    got = REGISTRY["q_embed_jl_projection"].fn(spark, sf_dir).collect()
    assert {r.label for r in got} == set(expect)
    for r in got:
        ms = expect[r.label]
        assert r.n_pairs == len(ms)
        assert r.min_milli == min(ms) and r.max_milli == max(ms)
        assert r.mean_milli_ratio == sum(ms) / len(ms)
        within = sum(1 for m in ms if abs(m - 1000) <= 500)
        assert r.within_500 == within and r.share_within == within / len(ms)
    # the sign matrix must not be rank-degenerate: with a healthy JL
    # matrix the pooled mean milli-ratio concentrates at 1000
    pooled = [m for ms in expect.values() for m in ms]
    assert abs(sum(pooled) / len(pooled) - 1000) < 350


def test_rouge_n_matches_counter_recompute(spark, sf_dir):
    """ROUGE-2 P/R/F1 milli-scores per lang must equal a
    collections.Counter recomputation over the same adjacent-id pairs
    — pinning the clipped-min semantics, the LEFT-join zero-match
    inclusion, and the shared-numerator F1 identity."""
    from collections import Counter

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    tk = {
        r.doc_id: ([t for t in r.text.split(" ") if t], r.lang) for r in docs
    }
    expect: dict[str, list[tuple[int, int, int]]] = {}
    for d in sorted(tk):
        if d % 2 or (d + 1) not in tk:
            continue
        ctk, lang = tk[d]
        rtk, _ = tk[d + 1]
        if len(ctk) < 2 or len(rtk) < 2:
            continue
        cb = Counter(zip(ctk, ctk[1:]))
        rb = Counter(zip(rtk, rtk[1:]))
        mn = sum(min(c, rb[g]) for g, c in cb.items())
        tc, tr = len(ctk) - 1, len(rtk) - 1
        expect.setdefault(lang, []).append(
            ((mn * 1000) // tc, (mn * 1000) // tr, (mn * 2000) // (tc + tr))
        )
    got = REGISTRY["q_eval_rouge_n"].fn(spark, sf_dir).collect()
    assert {r.lang for r in got} == set(expect)
    for r in got:
        ps = expect[r.lang]
        assert r.n_pairs == len(ps)
        assert r.mean_p_milli == sum(p for p, _, _ in ps) / len(ps)
        assert r.mean_r_milli == sum(q for _, q, _ in ps) / len(ps)
        assert r.mean_f1_milli == sum(f for _, _, f in ps) / len(ps)
        assert r.max_f1_milli == max(f for _, _, f in ps)
