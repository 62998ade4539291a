"""Driver-window auto-rotation (plans/registry.py).

The driver's correctness gate samples the FIRST 50 entries of
``queries()``.  The registry orders queries with no row in any
CORRECTNESS_r*.json first, so every round the gate verifies up to 50
previously-unverified queries with no manual re-ordering.  These tests
pin that contract so a refactor can't silently reorder the dict and
eject the rotation.
"""

import json
import os

from copperhead_spark.plans.registry import _DRIVER_WINDOW, all_queries

_R02 = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r02.json")


def test_never_driver_checked_queries_lead():
    """Every window slot goes to a query with no driver row yet (as long
    as enough unchecked queries exist, which holds while the registry
    keeps growing)."""
    import glob

    seen = set()
    root = os.path.join(os.path.dirname(__file__), "..")
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            seen.update(json.load(fh))
    names = list(all_queries())
    assert len(names) >= 50
    unchecked = [n for n in names if n not in seen]
    if len(unchecked) >= 50:
        assert [n for n in names[:50] if n in seen] == []


def test_window_prefers_full_oracles():
    """Rows-only queries take window slots only after every unchecked
    oracle-bearing query has had its turn."""
    import glob

    seen = set()
    root = os.path.join(os.path.dirname(__file__), "..")
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            seen.update(json.load(fh))
    qs = all_queries()
    unchecked_with_oracle = [
        n for n in qs if n not in seen and qs[n].oracle is not None
    ]
    if len(unchecked_with_oracle) >= 50:
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
