#!/usr/bin/env python
"""Round-12 long-tail audit: single-rep noop-sink timing of EVERY
registered query (the bench headline/soak only covers ~50 of ~300) to
find per-query pathologies like the r12 `pipeline_entity_resolution`
one (101 CPU-s on 2 tasks).  Single rep per query — this is a SCAN for
offenders, not a record; anything slow gets a proper best-of-2 +
stage-probe follow-up before being believed.

Run: python tools/tail_audit.py [sf_dir] [start[:end]]
Appends one JSON line per query to /tmp/tail_audit.jsonl (flushed as it
goes, so an interrupted run keeps its rows) and prints a worst-first
table at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _tree_cpu_s  # noqa: E402
from copperhead_spark.plans.registry import all_queries  # noqa: E402
from copperhead_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo, hi = 0, None
    if len(sys.argv) > 2:
        part = sys.argv[2].split(":")
        lo = int(part[0] or 0)
        hi = int(part[1]) if len(part) > 1 and part[1] else None
    registry = all_queries()
    names = list(registry)[lo:hi]
    spark = get_spark(
        app_name="tail-audit-r12",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    # warmup: touch the base tables once so the first row isn't charged
    # the cold page-cache read
    registry[names[0]].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    rows = []
    with open("/tmp/tail_audit.jsonl", "a") as out:
        for i, n in enumerate(names):
            spark.sparkContext.setJobDescription(f"tail-audit {n}")
            spark.catalog.clearCache()
            c0 = _tree_cpu_s()
            t0 = time.perf_counter()
            err = None
            try:
                registry[n].builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001 - record, keep scanning
                err = repr(e)[:160]
            wall = round(time.perf_counter() - t0, 3)
            c1 = _tree_cpu_s()
            cpu = None if c0 is None or c1 is None else round(c1 - c0, 3)
            rec = {"q": n, "wall": wall, "cpu": cpu, "err": err}
            rows.append(rec)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(
                f"{lo + i:3d} {n:48s} wall {wall:8.2f}  cpu {cpu if cpu is not None else -1:8.2f}"
                + (f"  ERR {err}" if err else ""),
                file=sys.stderr,
                flush=True,
            )
    rows.sort(key=lambda r: -(r["cpu"] or r["wall"]))
    print("\nworst by CPU:")
    for r in rows[:25]:
        print(f"  {r['q']:48s} wall {r['wall']:8.2f}  cpu {r['cpu']}")


if __name__ == "__main__":
    main()
