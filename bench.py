#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}.

Execution is measured end-to-end per query with a noop sink (full plan
runs, nothing collected to the driver) after a warmup pass of the first
query to absorb JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from copperhead_spark.plans.registry import all_queries
from copperhead_spark.session import get_spark

# headline set: one per operator family, weighted toward the shapes that
# dominate at 100 TB (scan+filter+agg, star join, window pivot, histogram,
# dedup/similarity once registered)
HEADLINE = [
    "flagship_selection_yield",
    "a6_pricing_summary",
    "a1_count_per_group",
    "j1_star_join_revenue",
    "j2_anti_join",
    "j4_top2_pivot",
    "a5_weighted_histogram",
    "w1_rank_in_group",
    "t1_time_bucket_agg",
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "sim_cosine_topk",
    "sim_quantized_topk",
    "text_quality_score",
    "text_gopher_filter",
    "ml_mlp_inference",
    # round-2 additions: retrieval, sketches, bloom semi-join reduction
    "text_bm25_topk",
    "sketch_hll_distinct",
    "sketch_cms_counts",
    "bloom_semijoin_reduction",
    # round-3 additions (append-only set: r02/r03 deltas stay comparable
    # on the carried-forward prefix): substring-span dedup, bigram-LM
    # scoring, sessionization, iterative PageRank
    "text_substring_dedup",
    "text_bigram_lm_score",
    "sessionize_events",
    "graph_pagerank",
    # round-3 additions: tokenizer inference, banded media near-dup,
    # label-propagation communities
    "text_bpe_encode",
    "mm_phash_dedup",
    "graph_label_propagation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="copperhead-bench")

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: run the first query once to pay JVM + codegen startup
    if names:
        queries[names[0]].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    import gc as _gc

    timings: dict[str, float] = {}

    # the copperhead-shaped headline: jagged-event stage1+stage2 with the
    # zero-shuffle array-native plan.  Input is materialized parquet
    # (generated executor-side, written once as setup — generation is not
    # what's being measured), 10M events/sf.
    import shutil
    import tempfile

    from copperhead_spark.fixtures import events_fixture_distributed
    from copperhead_spark.pipeline import stage1_arrays, stage2_variations

    n_events = max(int(10_000_000 * sf), 10_000) if sf > 0 else 10_000
    tmp = tempfile.mkdtemp(prefix="cph_bench_")

    def time_pipeline(ev):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            stage2_variations(stage1_arrays(ev)).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    try:
        events_fixture_distributed(spark, n_events).write.parquet(f"{tmp}/events")
        ev = spark.read.parquet(f"{tmp}/events")
        # warmup on a small slice: same plan -> Janino codegen cache is
        # hot, so the timed run measures throughput, not compilation
        events_fixture_distributed(spark, 5000).write.parquet(f"{tmp}/warmup")
        wu = spark.read.parquet(f"{tmp}/warmup")
        stage2_variations(stage1_arrays(wu)).write.format("noop").mode("overwrite").save()
        # the jagged pipeline is the most session-history-sensitive plan
        # here (~2.4s in a young JVM vs ~4.5s after the 28 headline
        # queries, independent of load and of code-cache size).  It is
        # measured TWICE: the carried-forward key keeps its historical
        # tail-of-session position so r01/r02 deltas stay comparable;
        # the _young key records the same plan on the clean JVM so the
        # session-state cost is visible instead of folded into a
        # pseudo-regression.
        timings[f"pipeline_jagged_{n_events // 1000}k_events_young"] = time_pipeline(ev)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise

    # best-of-2: single-shot numbers on a shared host swing 3-10x with
    # background load; min-of-two is the standard noise floor estimate
    for name in names:
        # heap barrier OUTSIDE the timed window: iterative queries
        # (pagerank/kcore/CC) eagerly localCheckpoint edge lists whose
        # blocks linger until the ContextCleaner notices the dropped
        # refs — without this, queries late in the run pay earlier
        # queries' garbage (measured 1.5-2x inflation on the tail)
        _gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    try:
        # carried-forward tail-of-session measurement (see note above)
        timings[f"pipeline_jagged_{n_events // 1000}k_events"] = time_pipeline(ev)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
