#!/usr/bin/env python
"""Round-12 measurement harness: time named queries (wall + process-tree
CPU, best-of-2, noop sink) in one session and optionally dump
`explain("formatted")` per query to plans/r12/<name>_<tag>.txt.

Run: python tools/measure_r12.py <tag> [query[,query...]]
  tag: suffix for the explain files ("before" / "after"); "none" skips
       explain capture.
  Queries default to the bench HEADLINE list.

Prints one JSON line {"wall": {...}, "cpu": {...}} and appends it to
/tmp/measure_r12_<tag>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _time_query_cpu  # noqa: E402
from copperhead_spark.plans.registry import all_queries  # noqa: E402
from copperhead_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "none"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else
        [n for n in HEADLINE if n in registry]
    )
    spark = get_spark(
        app_name=f"measure-r12-{tag}",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    if tag != "none":
        os.makedirs(plans_dir, exist_ok=True)
    # warmup
    registry[names[0]].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall: dict[str, float] = {}
    cpu: dict[str, float | None] = {}
    for n in names:
        spark.sparkContext.setJobDescription(n)
        t0 = time.perf_counter()
        wall[n], cpu[n] = _time_query_cpu(spark, registry[n], sf_dir)
        print(f"{n:45s} wall {wall[n]:7.2f}  cpu {cpu[n] or -1:7.2f}  "
              f"(loop {time.perf_counter() - t0:.1f}s)", file=sys.stderr)
        if tag != "none":
            df = registry[n].builder(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    line = json.dumps({"tag": tag, "sf_dir": sf_dir, "wall": wall, "cpu": cpu})
    with open(f"/tmp/measure_r12_{tag}.json", "a") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
