#!/usr/bin/env python
"""Pre-flight the driver correctness gate locally: run EVERY registered
query against its DuckDB oracle at the driver's scale factor (sf0.01 by
default — note tests/ default to sf0.001, which misses sf-dependent
drift) and report failures.

Run: python tools/preflight.py [sf_dir] [start[:end] | name[,name...]]
  python tools/preflight.py                      # all queries, sf0.01
  python tools/preflight.py /root/testdata/sf0.01 0:50   # the driver window
  python tools/preflight.py /root/testdata/sf0.01 q1,q2  # specific queries
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from copperhead_spark.plans.registry import all_queries
    from copperhead_spark.session import get_spark
    from copperhead_spark.testing import make_duckdb, run_query_vs_oracle

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    lo, hi, names = 0, None, None
    if len(sys.argv) > 2:
        sel = sys.argv[2]
        if sel and not sel.replace(":", "").isdigit():
            names = sel.split(",")
        else:
            part = sel.split(":")
            lo = int(part[0] or 0)
            hi = int(part[1]) if len(part) > 1 and part[1] else None

    # Hard no-silent-fallback gate (r8 verdict task 2): a janino compile
    # failure normally logs one ERROR and silently drops the stage to
    # interpreted evaluation — invisible to the plan-TEXT audit and a
    # real tax at scale.  With fallback=false the failure THROWS, so any
    # compile-fallback anywhere in the registry turns a preflight row red.
    spark = get_spark(
        app_name="copperhead-preflight",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    duck = make_duckdb(sf_dir)
    registry = all_queries()
    if names is not None:
        missing = [n for n in names if n not in registry]
        if missing:
            print(f"unknown queries: {missing}")
            return 1
        qs = [(n, registry[n]) for n in names]
    else:
        qs = list(registry.items())[lo:hi]
    bad: list[str] = []
    for i, (name, q) in enumerate(qs):
        try:
            rep = run_query_vs_oracle(spark, duck, q, sf_dir)
            ok = "[OK]" in str(rep)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            rep, ok = f"{name} EXC {e!r}"[:200], False
        if not ok:
            bad.append(name)
        print(f"{lo + i:3d} {rep}", flush=True)
    print(f"\n{len(qs) - len(bad)}/{len(qs)} green at {sf_dir}")
    if bad:
        print("FAILED:", ", ".join(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
