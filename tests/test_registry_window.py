"""Driver-window rotation (plans/registry.py:_DRIVER_WINDOW).

The driver's correctness gate samples the FIRST 50 entries of
``queries()``; rounds 1-2 sampled the same 50, so round 3 rotates the
never-checked dedup/similarity/sketch/text/streaming queries into the
window.  These tests pin that contract so a refactor can't silently
reorder the dict and eject the rotation.
"""

import json
import os

from copperhead_spark.plans.registry import _DRIVER_WINDOW, all_queries

_R02 = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r02.json")


def test_first_50_are_the_declared_window():
    names = list(all_queries())
    assert len(names) >= 50
    assert names[:50] == list(_DRIVER_WINDOW)[:50]


def test_window_has_full_oracles():
    qs = all_queries()
    rows_only = [n for n in list(qs)[:50] if qs[n].oracle is None]
    assert rows_only == [], f"rows-only queries waste window slots: {rows_only}"


def test_window_rotates_previously_checked_out():
    with open(_R02) as f:
        checked = set(json.load(f))
    overlap = [n for n in list(all_queries())[:50] if n in checked]
    assert overlap == [], f"window wastes slots on already-verified: {overlap}"


def test_no_registered_name_lost_by_reordering():
    qs = all_queries()
    assert len(qs) == len(set(qs)) >= 132
    # every window name must actually exist in the registry
    assert [n for n in _DRIVER_WINDOW if n not in qs] == []
