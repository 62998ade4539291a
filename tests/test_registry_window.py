"""Driver-window auto-rotation (plans/registry.py).

The driver's correctness gate samples the FIRST 50 entries of
``queries()``.  The registry orders queries green-aware (round 5, after
round 4 shipped reds that key-presence rotation would never re-check):

  tier 0  checked but latest driver row RED   -> retries lead
  tier 1  never-checked, full oracle
  tier 2  never-checked, rows-only
  tier 3  latest driver row green

These tests pin that contract so a refactor can't silently reorder the
dict and eject the rotation.
"""

import glob
import json
import os
import re

from copperhead_spark.plans.registry import (
    _DRAIN_ORDER,
    _DRIVER_WINDOW,
    _driver_status,
    _row_green,
    all_queries,
)

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _latest_rows() -> dict[str, tuple[bool, int]]:
    status: dict[str, tuple[bool, int]] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                status[name] = (_row_green(row), rnd)
    return status


def _latest_status() -> dict[str, bool]:
    return {n: g for n, (g, _) in _latest_rows().items()}


def test_row_green_semantics():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    assert _row_green(ok)
    assert not _row_green({**ok, "hash_match": False})
    assert not _row_green({**ok, "err": "TypeError: unhashable type: 'list'"})
    # oracle-less rows-only row: hash_match null, rows_match carries it
    assert _row_green({"rows_match": True, "hash_match": None, "err": None})
    assert not _row_green({"rows_match": False, "hash_match": None, "err": None})


def test_red_retries_lead_the_window():
    """Any query whose LATEST driver row is red must re-enter the window
    ahead of everything else (round-4 lesson: approx_aggregates sat red
    from r02 with no retry because rotation read keys, not status)."""
    status = _latest_status()
    reds = [n for n in status if not status[n]]
    names = list(all_queries())
    assert names[: len(reds)] == sorted(
        names[: len(reds)], key=names.index
    )  # stable
    assert set(names[: len(reds)]) == set(reds), (
        f"window head {names[:len(reds)]} != red retries {sorted(reds)}"
    )


def test_never_checked_fill_remaining_slots():
    """After the retries, every remaining window slot goes to a query
    with no driver row yet (while enough unchecked queries exist)."""
    status = _latest_status()
    names = list(all_queries())
    n_red = sum(not g for g in status.values())
    unchecked = [n for n in names if n not in status]
    if len(unchecked) >= 50 - n_red:
        tail = names[n_red:50]
        assert [n for n in tail if n in status] == [], (
            "already-verified queries waste window slots"
        )


def test_window_prefers_full_oracles():
    """Rows-only queries take window slots only after every red retry and
    unchecked oracle-bearing query has had its turn."""
    status = _latest_status()
    qs = all_queries()
    n_red = sum(not g for g in status.values())
    unchecked_with_oracle = [
        n for n in qs if n not in status and qs[n].oracle is not None
    ]
    if n_red + len(unchecked_with_oracle) >= 50:
        rows_only = [n for n in list(qs)[:50] if qs[n].oracle is None]
        assert rows_only == [], f"rows-only queries waste window slots: {rows_only}"


def test_drain_order_pins_new_queries_behind_snapshot():
    """A query registered after the round-5 snapshot must not displace a
    snapshot query from the drain: within the never-checked tier, every
    _DRAIN_ORDER name precedes every non-snapshot name."""
    status = _latest_status()
    names = list(all_queries())
    unchecked = [n for n in names if n not in status]
    snap = [n for n in unchecked if n in set(_DRAIN_ORDER) | set(_DRIVER_WINDOW)]
    if snap:
        last_snap = max(unchecked.index(n) for n in snap)
        early_new = [
            n
            for n in unchecked[:last_snap]
            if n not in set(_DRAIN_ORDER) | set(_DRIVER_WINDOW)
        ]
        assert early_new == [], (
            f"new queries jumped the drain queue: {early_new}"
        )


def test_module_and_test_status_agree():
    assert _driver_status() == _latest_rows()


def test_tier3_is_staleness_sorted():
    """Within the verified-green tail (tier 3), queries are ordered by
    OLDEST green round first, so the driver's 50-slot window genuinely
    re-verifies the stalest greens each round instead of re-checking the
    same head forever (r8 verdict task 3).  A full re-verification cycle
    over ~280 greens at 50/round is ~6 rounds."""
    rows = _latest_rows()
    names = list(all_queries())
    tier3 = [n for n in names if n in rows and rows[n][0]]
    # tier 3 forms a contiguous tail (reds + unchecked lead)
    assert names[len(names) - len(tier3):] == tier3
    rounds = [rows[n][1] for n in tier3]
    assert rounds == sorted(rounds), (
        "tier 3 not staleness-sorted: a fresher-green query precedes a "
        "staler one"
    )


def test_no_registered_name_lost_by_reordering():
    qs = all_queries()
    assert len(qs) == len(set(qs)) >= 200
    # every pinned name must actually exist in the registry
    assert [n for n in _DRIVER_WINDOW + _DRAIN_ORDER if n not in qs] == []
