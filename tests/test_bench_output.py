"""Bench-artifact truncation contract (r5 verdict "What's wrong" #2).

The driver preserves only the LAST ~2000 characters of bench.py's
stdout. BENCH_r05.json lost its own headline because the value and the
median queries dict were emitted first and truncated away. These gates
pin the fix: a compact summary line is printed LAST, parses
stand-alone, stays inside the tail window at the full headline count,
and ends with the total so even further truncation keeps the headline.
"""

from __future__ import annotations

import json

import bench


def _fake_run():
    # worst-case realistic shapes: every headline query present, with
    # 3-decimal medians and wide spreads
    timings = {name: 12.345 for name in bench.HEADLINE}
    spread = {name: [9.876, 19.876] for name in bench.HEADLINE}
    return timings, spread


def test_compact_line_is_last_parses_and_fits_tail_window():
    timings, spread = _fake_run()
    lines = bench.emit_lines(timings, spread, {}, 0.1)
    assert len(lines) == 2
    compact = json.loads(lines[-1])
    assert compact["value"] == round(sum(timings.values()), 3)
    assert compact["n_ok"] == len(bench.HEADLINE)
    assert len(compact["queries"]) == len(bench.HEADLINE)
    # the driver's tail window; headroom so adding a handful of
    # queries next round cannot silently regress the artifact again
    assert len(lines[-1]) <= 1900, (
        f"compact line {len(lines[-1])} chars — trim precision or keys "
        "before it outgrows the driver's 2000-char tail"
    )
    # the headline value must be the LAST key, so a front-truncated
    # tail still ends with it
    assert lines[-1].rstrip().endswith(f'"value":{compact["value"]}}}')


def test_full_line_orders_value_and_queries_last():
    timings, spread = _fake_run()
    full = bench.emit_lines(timings, spread, {}, 0.1)[0]
    d = json.loads(full)
    keys = list(d)
    assert keys[-1] == "value" and keys[-2] == "queries"
    assert keys[0] == "spread"


def test_errors_withhold_the_total():
    timings, spread = _fake_run()
    lines = bench.emit_lines(timings, spread, {"q_x": "Boom"}, 0.1)
    assert json.loads(lines[0])["value"] is None
    assert json.loads(lines[1])["value"] is None


def test_compact_abbreviation_is_collision_free():
    seen = {}
    for name in bench.HEADLINE:
        a = bench.abbrev(name)
        assert a not in seen, f"abbrev collision: {name} vs {seen[a]} -> {a}"
        seen[a] = name


def test_bench_keys_manifest_matches_headline():
    """BENCH_KEYS.json decodes the compact line's abbreviated keys —
    regenerate it whenever HEADLINE changes (it is what a reader joins
    the tail-truncated driver artifact against)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_KEYS.json")
    manifest = json.load(open(path))
    assert manifest == {n: bench.abbrev(n) for n in bench.HEADLINE}


def test_compact_line_contention_diagnostics():
    """r12 (r11 verdict task 3): the compact line must self-identify a
    contended run — med/min ratio percentiles always present, the
    stall list empty on a quiet box and capped at 8 when everything
    stalls (so the worst case still fits the tail window)."""
    timings, spread = _fake_run()
    quiet = json.loads(bench.emit_lines(timings, spread, {}, 0.1)[-1])
    assert quiet["sprd"]["r50"] == round(12.345 / 9.876, 2)
    assert quiet["stall"] == {}, "1.25x med/min is under the 1.3x stall bar"
    contended = {name: [6.0, 19.876] for name in bench.HEADLINE}
    hot = json.loads(bench.emit_lines(timings, contended, {}, 0.1)[-1])
    assert hot["sprd"]["r50"] > 2.0
    assert len(hot["stall"]) == 8
    for _k, (mn, med) in hot["stall"].items():
        assert med > 1.3 * mn
