"""Registry rotation invariants.

The driver's correctness gate walks ``queries()`` in iteration order
with a fixed budget (50), so the ordering IS the coverage strategy:
red rows first, then never-driver-checked names (oldest rounds first,
round-robined across modules), then settled names. A silent ordering
regression would stall the driver-verification tail for a whole round.
"""

from __future__ import annotations

from azurestorage_blueprints_spark.queries import (
    _NEWEST_ROUND,
    _check_history,
    load_all,
)


def test_never_checked_names_precede_settled_ones():
    reg = load_all()
    recheck, settled, last_round = _check_history()
    max_round = max(last_round.values(), default=0)
    names = list(reg)

    def tier(n: str) -> int:
        if n in recheck:
            return 0
        if n in settled and last_round[n] <= max_round - 6:
            return 1  # ancient green rows outrank this round's additions
        if n not in settled:
            return 2
        return 3

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), (
        "registry order must be recheck < ancient-green < never-checked < settled"
    )


def test_newest_round_names_exist_and_sort_after_older_tail():
    reg = load_all()
    missing = [n for n in _NEWEST_ROUND if n not in reg]
    assert not missing, f"_NEWEST_ROUND names not in registry: {missing}"
    recheck, settled, _ = _check_history()
    names = list(reg)
    older_tail = [
        i for i, n in enumerate(names)
        if n not in recheck and n not in settled and n not in _NEWEST_ROUND
    ]
    newest = [i for i, n in enumerate(names) if n in _NEWEST_ROUND and n not in settled]
    if older_tail and newest:
        assert max(older_tail) < min(newest), (
            "older never-checked names must be offered to the driver before "
            "this round's additions"
        )


def test_check_budget_covers_the_whole_unverified_tail():
    reg = load_all()
    recheck, settled, _ = _check_history()
    unverified = [n for n in reg if n not in settled]
    assert len(unverified) <= 50, (
        f"{len(unverified)} unverified queries exceed the driver's 50-row "
        "budget — stop registering and let the rotation catch up"
    )


def test_settled_tier_is_ordered_stalest_driver_row_first():
    """r6 verdict task 5: with the never-checked queue empty, the
    driver's budget must refresh the OLDEST green rows — the settled
    tier is sorted ascending by the round of each name's latest
    CORRECTNESS row."""
    reg = load_all()
    recheck, settled, last_round = _check_history()
    max_round = max(last_round.values(), default=0)
    # ancient rows are hoisted ahead of the never-checked tier (r10),
    # so stalest-first must hold within EACH of the two green segments
    ancient = [
        last_round[n] for n in reg if n in settled and last_round[n] <= max_round - 6
    ]
    rest = [last_round[n] for n in reg if n in settled and last_round[n] > max_round - 6]
    assert ancient == sorted(ancient) and rest == sorted(rest), (
        "settled names must be ordered oldest-checked-first within each segment"
    )
    rounds = ancient + rest
    if rounds:
        # the head of the settled ordering really is the stalest cohort
        first_settled = next(n for n in reg if n in settled)
        assert last_round[first_settled] == min(rounds)
