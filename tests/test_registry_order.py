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
    recheck, settled, _ = _check_history()
    names = list(reg)
    tiers = [
        0 if n in recheck else (1 if n not in settled else 2) for n in names
    ]
    assert tiers == sorted(tiers), "registry order must be recheck < never-checked < settled"


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
    rounds = [last_round[n] for n in reg if n in settled]
    assert rounds == sorted(rounds), (
        "settled names must be ordered oldest-checked-first"
    )
    if rounds:
        # the head of the settled tier really is the stalest cohort
        first_settled = next(n for n in reg if n in settled)
        assert last_round[first_settled] == min(rounds)
