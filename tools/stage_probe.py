#!/usr/bin/env python
"""Per-stage breakdown of named queries: run with the UI enabled and pull
/api/v1 stage metrics (task counts, executor run/CPU time, shuffle bytes)
after each query, so CPU hotspots can be attributed to stages instead of
guessed.  Measurement-only tool; never used by queries or bench.

Run: python tools/stage_probe.py query[,query...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from copperhead_spark.plans.registry import all_queries  # noqa: E402
from copperhead_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1].split(",")
    registry = all_queries()
    spark = get_spark(
        app_name="stage-probe",
        extra_conf={
            "spark.sql.codegen.fallback": "false",
            "spark.ui.enabled": "true",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            return json.loads(r.read())

    # warmup (shared fixtures, JIT)
    registry[names[0]].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    seen = {s["stageId"] for s in stages()}
    for n in names:
        spark.sparkContext.setJobDescription(n)
        t0 = time.perf_counter()
        registry[n].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        new = [s for s in stages() if s["stageId"] not in seen]
        seen |= {s["stageId"] for s in new}
        new.sort(key=lambda s: -s.get("executorCpuTime", 0))
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
        tot_run = sum(s.get("executorRunTime", 0) for s in new) / 1e3
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in new)
        print(f"\n=== {n}: wall {wall:.2f}s, {len(new)} stages, {n_tasks} tasks, "
              f"executor cpu {tot_cpu:.2f}s, run {tot_run:.2f}s")
        for s in new[:14]:
            print(f"  stage {s['stageId']:4d} tasks {s['numCompleteTasks']:4d} "
                  f"cpu {s.get('executorCpuTime', 0)/1e9:6.2f}s "
                  f"run {s.get('executorRunTime', 0)/1e3:6.2f}s "
                  f"srd {s.get('shuffleReadBytes', 0)>>10:8d}K "
                  f"swr {s.get('shuffleWriteBytes', 0)>>10:8d}K  "
                  f"{(s.get('description') or s['name'])[:70]}")


if __name__ == "__main__":
    main()
