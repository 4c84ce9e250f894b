"""Candidate-growth gate over the committed sweep artifacts (r7 verdict
task 3): every pair-emitting rung's output must stay O(N) across the
sf0.01 / sf0.1 / sf1 sweeps.

The r7 SimHash hazard (727M rows at sf1, Theta(N^2/1024) from a
constant blocking key space) sat in plain sight across two committed
artifacts because nothing diffed them — this test makes the artifact
itself fail loudly. The gate is the absolute form the verdict asks
for: rows <= c * N_rows(sf) + floor, with c documented per rung below.
c is calibrated to the measured genuine near-dup density of the
corpora (the sf1 tiling repeats every sf0.1 row 10x, so true duplicate
pairs per doc reach ~5-6 — see SCALING.md "Round-8 SimHash geometry");
a rung whose candidates grow with N^2/constant blows through any
constant c at the next SF step, which is exactly the failure mode the
gate exists to catch.

When adding a pair-emitting query (output keyed by two row ids), add it
to PAIR_RUNGS with its N basis and a c justified in the query's doc.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: sweep artifact per SF and the row count of each N basis table there
ARTIFACTS = [
    ("ORACLE_LOCAL.json", {"documents": 500, "embeddings": 200}),
    ("ORACLE_LOCAL_SF01.json", {"documents": 5_000, "embeddings": 2_000}),
    ("ORACLE_LOCAL_SF1.json", {"documents": 50_000, "embeddings": 20_000}),
]

#: r9 verdict task 6: the sf10 PAIR-RUNG spot sweep (rows-only, six
#: rungs — scripts/make_sf10_pairs.py + scripts/sweep_sf10_pairs.py)
#: extends the linearity evidence one more decade. Its tiling keeps
#: the sf1 duplicate-multiplicity regime (10 verbatim copies inside
#: each of 10 token-salted super-blocks), so the same c values apply.
#: Used by the linear gate only — the completeness check needs a FULL
#: registry artifact, which this deliberately is not.
SPOT_ARTIFACTS = [
    ("ORACLE_LOCAL_SF10_PAIRS.json", {"documents": 500_000, "embeddings": 200_000}),
]

#: rung -> (N basis table, c). Output rows must be <= c * N + FLOOR.
PAIR_RUNGS = {
    # SimHash ladder: occupancy cap bounds candidates at O(N * cap);
    # measured density is <= ~5 pairs/doc at sf1 (10x tiling)
    "q_dedup_simhash": ("documents", 10),
    "q_dedup_simhash_portable": ("documents", 10),
    # MinHash banding: genuine duplicate density (the sf1 tiling's
    # 5000 x C(10,2) identical-text pairs) reaches ~6 pairs/doc
    "q_dedup_minhash_lsh": ("documents", 16),
    "q_dedup_minhash_portable": ("documents", 16),
    # label-blocked embedding cosine: ~5 pairs/vector at sf1
    "q_dedup_embedding": ("embeddings", 16),
    # sign-LSH embedding blocking (r9): shares the simhash machinery
    # (occupancy cap + identical-signature rescue), same density basis
    "q_dedup_embedding_lsh": ("embeddings", 16),
    # aHash blocking (image twin of the SimHash rung, occupancy-capped
    # like it): ~5 pairs/vector at sf1
    "q_multimodal_image_ahash": ("embeddings", 16),
}

#: slack for tiny corpora where a single dense cluster dominates
FLOOR = 2_000


def _load(name: str) -> dict | None:
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("rung", sorted(PAIR_RUNGS))
def test_pair_rung_output_stays_linear(rung):
    basis, c = PAIR_RUNGS[rung]
    checked = 0
    for art_name, bases in ARTIFACTS + SPOT_ARTIFACTS:
        art = _load(art_name)
        if art is None:  # sf1 artifact is gitignored-data derived; may lag
            continue
        row = art.get(rung)
        if row is None:
            continue
        rows = row.get("spark_rows")
        if rows is None:  # errored / skipped row — the sweep itself reports it
            continue
        n = bases[basis]
        bound = c * n + FLOOR
        assert rows <= bound, (
            f"{rung} emitted {rows} rows at {art_name} (N={n} {basis}) — "
            f"over the documented O(N) bound {bound} (c={c}); candidate "
            f"generation is growing superlinearly, see SCALING.md"
        )
        checked += 1
    assert checked >= 2, f"{rung}: fewer than 2 sweep artifacts had a row"


#: r9 verdict task 6: guaranteed-clone recall at sf10, where the
#: identical-signature rescue's STAR regime carries the recall (the
#: multiplicity-10 tiling pushes identical groups past
#: _IDENT_GROUP_CAP, a regime no full-sweep SF reaches). The sweep
#: records found/planted per audit; found must equal planted — the
#: same 100% identical-clone floor the gate SFs pin in
#: tests/test_r8_semantics.py / test_r9_semantics.py.
AUDIT_RECALL_RUNGS = ["q_dedup_simhash_audit", "q_dedup_embedding_lsh_audit"]


@pytest.mark.parametrize("rung", AUDIT_RECALL_RUNGS)
def test_sf10_audit_recall_is_complete(rung):
    art = _load("ORACLE_LOCAL_SF10_PAIRS.json")
    if art is None or rung not in art:
        pytest.skip("sf10 spot artifact absent or predates the recall column")
    rec = art[rung].get("recall")
    assert rec is not None, f"{rung}: sf10 row has no recall record — rerun the spot sweep"
    assert rec["planted"] > 0
    assert rec["found"] == rec["planted"], (
        f"{rung}: {rec['found']}/{rec['planted']} {rec['class']} clones found at "
        f"sf10 — the identical-signature rescue lost recall in its star regime"
    )


def test_every_registered_pair_emitter_is_gated():
    """Completeness check over the PAIR-SHAPED query families: any
    registered query in the dedup / kNN / graph / similarity families
    whose sweep rows exceed 4x the documents count at the LARGEST
    artifact present must either be in PAIR_RUNGS (gated) or listed
    here as a documented exception. Catches the next pair-emitting
    rung someone forgets to gate (general projections over lineitem /
    events are linear in THEIR fact table and out of scope)."""
    import re

    pair_family = re.compile(r"^q_(dedup|knn|graph|semdedup|embed)_|ahash")
    exceptions: dict[str, str] = {}
    for art_name, bases in reversed(ARTIFACTS):
        art = _load(art_name)
        if art is not None:
            break
    else:
        pytest.skip("no sweep artifacts present")
    n_docs = bases["documents"]
    for name, row in art.items():
        rows = row.get("spark_rows")
        if (
            rows is None
            or not pair_family.search(name)
            or name in PAIR_RUNGS
            or name in exceptions
        ):
            continue
        assert rows <= 4 * n_docs + FLOOR, (
            f"{name} emitted {rows} rows at {art_name} (docs={n_docs}) — "
            f"pair-family query over the O(N) line; add it to PAIR_RUNGS "
            f"with a documented c or to the exceptions dict with a reason"
        )
