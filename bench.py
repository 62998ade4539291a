#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N, ...}.

Execution is measured end-to-end per query with a noop sink (full plan
runs, nothing collected to the driver) after a warmup pass of the first
query to absorb JVM/codegen startup.

Three measurement tiers per run:
  - "queries": the carried-forward single-session loop (append-only key
    set since r01 — round-over-round deltas compare this dict).
  - "queries_young": every headline query re-timed on a freshly restarted
    SparkContext (batches of 6, so no query sees more than ~5 queries of
    session history).  Session-aging regressions show up as
    queries[name] >> queries_young[name]; plan regressions move both.
  - "soak": the jagged pipeline at 10x the headline event count on its
    own fresh context, to catch memory-shape surprises a 10x scan hits
    (array HOF codegen width, histogram agg width) before 100 TB does.
"""

from __future__ import annotations

import gc as _gc
import json
import os
import re
import shutil
import statistics
import subprocess
import sys
import tempfile
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
    # round-4 additions: vector-store E2E (build -> probe -> rerank ->
    # recall gate), tokenizer lifecycle E2E (train -> kernel encode)
    "pipeline_ann_query_e2e",
    "pipeline_tokenizer_train_encode",
    # round-5 additions: corpus-scaled keyword extraction (tokenize-once
    # TF-IDF), frontier-expansion BFS on the shared edge cache
    "text_tfidf_topterms",
    "graph_bfs_distances",
    # round-5 additions: exact-integer Gram build + DECIMAL power
    # iteration, grid-bucketed spatial radius join
    "emb_power_iteration",
    "geo_grid_radius_join",
    # round-7 addition: filtered ANN (metadata predicate pushed into the
    # IVF candidate scan — the production vector-store request shape).
    # The round's other flagship, pipeline_pretrain_corpus_e2e, is ~12s
    # at sf0.1 (it composes LSH+CC+decontamination+packing) and is
    # measured once per record in the soak section instead of 4x here.
    "sim_filtered_ivf_topk",
    # round-8 additions: the ROOT chunked-scan path (encode fixture ->
    # TKey/TBasket walk -> mapInArrow decode -> aggregate, the S1
    # operator the uproot gate used to block) and the iterative
    # sufficient-stats logistic trainer
    "s1_root_scan",
    "ml_logreg_irls",
    # round-9 additions: the composed reference-parity chain (ROOT bytes
    # -> jagged scan -> stage1/2 -> histogram -> TH1F read-back) and the
    # model-in-the-loop curation flagship (gold label -> IRLS train ->
    # map-only filter -> mixture -> packing)
    "pipeline_root_to_th1_e2e",
    "pipeline_classifier_curation_e2e",
    # round-10 addition: the e2e chain with the systematic-variation axis
    # threaded through the TH1 sink (3x stacked rows into the one
    # aggregation shuffle + one template per region x channel x
    # variation).  The round's other flagship, pipeline_root_to_fit_e2e,
    # is ~10s at sf0.1 (two pipeline passes + six-family driver fits) and
    # is measured once per record in the soak section instead of 4x here
    # (the pipeline_pretrain_corpus_e2e precedent).
    "pipeline_root_to_th1_variations_e2e",
    # round-11 addition: the full stage-2 shape — fold-routed MVA scored
    # between stage1 and the histogram (pandas UDF + broadcast weights,
    # zero added shuffles), over the chunked ROOT scan front end
    "pipeline_root_to_mva_histogram_e2e",
]

# fresh-context batch width for the young pass: small enough that no
# query sees meaningful session history, large enough that the ~2s
# context restart amortizes
_YOUNG_BATCH = 6


def _tree_cpu_s() -> float | None:
    """CPU seconds consumed so far by this process and its whole live
    subtree — the Python driver, the py4j-launched JVM (where local-mode
    executors run), pyspark.daemon and its UDF workers — plus already-
    reaped children via cutime/cstime, so a worker that exits between
    two probes is normally still counted once (its lifetime lands in the
    parent's cutime).  Known under-count (r10 ADVICE): a descendant that
    is orphaned (reparented to PID 1) or daemonizes escapes both the
    ppid subtree walk and every walked ancestor's cutime — pyspark.daemon
    workers can outlive their parent this way — so deltas are a floor,
    not an exact census.  Deltas of this next to wall time make host I/O
    starvation directly separable from compute regressions in the
    record: starvation inflates wall with CPU flat, a plan regression
    moves both.  (The JVM's own OperatingSystemMXBean.getProcessCpuTime
    is not reachable through py4j under JDK 17 module encapsulation —
    the /proc subtree walk is the portable Linux route.)  None when
    /proc is unavailable (non-Linux host)."""
    try:
        hz = os.sysconf("SC_CLK_TCK") or 100
        stats: dict[int, tuple[int, int]] = {}
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/stat") as fh:
                    rest = fh.read().rsplit(") ", 1)[1].split()
            except (OSError, IndexError):
                continue  # raced a process exit
            # fields after "(comm) ": state ppid ... utime(14) stime(15)
            # cutime(16) cstime(17) -> indices 1, 11, 12, 13, 14
            stats[int(ent)] = (
                int(rest[1]),
                int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14]),
            )
    except (OSError, ValueError):
        return None
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        kids.setdefault(ppid, []).append(pid)
    total = 0
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        if p in stats:
            total += stats[p][1]
            stack.extend(kids.get(p, ()))
    return total / hz


def _time_query_cpu(spark, q, sf_dir: str) -> tuple[float, float | None]:
    """best-of-2 noop-sink timing with heap barriers OUTSIDE the timed
    window: iterative queries (pagerank/kcore/CC) eagerly localCheckpoint
    edge lists whose blocks linger until the ContextCleaner notices the
    dropped refs — without the barrier, queries late in the run pay
    earlier queries' garbage (measured 1.5-2x inflation on the tail).
    Single-shot numbers on a shared host swing 3-10x with background
    load; min-of-two is the standard noise floor estimate.  Returns
    (wall s, process-tree CPU s of the best-wall attempt) — the CPU
    column is the r9 adjudication gap: without it, environment-vs-code
    had to be inferred from probes and diffs."""
    _gc.collect()
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    best: tuple[float, float | None] = (float("inf"), None)
    for _ in range(2):
        c0 = _tree_cpu_s()
        t0 = time.perf_counter()
        q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        c1 = _tree_cpu_s()
        cpu = None if c0 is None or c1 is None else round(c1 - c0, 4)
        if wall < best[0]:
            best = (wall, cpu)
    return round(best[0], 4), best[1]


def _time_query(spark, q, sf_dir: str) -> float:
    return _time_query_cpu(spark, q, sf_dir)[0]


def _time_pipeline(spark, ev) -> tuple[float, float | None]:
    from copperhead_spark.pipeline import stage1_arrays, stage2_variations

    spark.catalog.clearCache()
    spark._jvm.System.gc()
    best: tuple[float, float | None] = (float("inf"), None)
    for _ in range(3):
        c0 = _tree_cpu_s()
        t0 = time.perf_counter()
        stage2_variations(stage1_arrays(ev)).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        c1 = _tree_cpu_s()
        cpu = None if c0 is None or c1 is None else round(c1 - c0, 4)
        if wall < best[0]:
            best = (wall, cpu)
    return round(best[0], 4), best[1]


def _cached_gb() -> float:
    """Page-cache size from /proc/meminfo — the r9 contamination mode's
    telltale: after a bench writes+reads GBs, Cached sitting at ~0.5 GB
    with >100 GB free means the HOST is reclaiming guest page cache
    (balloon), so timed re-reads hit virtio disk instead of RAM."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("Cached:"):
                    return round(int(line.split()[1]) / 2**20, 2)
    except (OSError, ValueError, IndexError):
        pass
    return -1.0


def _cache_reclaim_probe(tmpdir: str) -> dict:
    """Detect ACTIVE host page-cache reclaim (r9 discovery): write a
    256 MB probe file, read it twice.  On a healthy box the second read
    comes from page cache at RAM speed (<0.2 s); under active balloon
    reclaim the pages are evicted as fast as they fault in and the
    second read runs at disk speed (>1 s) — the mechanism behind the
    bimodal 2.4 s / 18 s pipeline timings this round (controlled
    drop_caches reproduced the slow mode exactly; steal and load gates
    cannot see it because no CPU is stolen and no process runs)."""
    p = os.path.join(tmpdir, "cache_probe.bin")
    blk = os.urandom(1 << 20)
    with open(p, "wb") as fh:
        for _ in range(256):
            fh.write(blk)
    os.sync()

    def rd() -> float:
        t0 = time.perf_counter()
        with open(p, "rb") as fh:
            while fh.read(1 << 22):
                pass
        return time.perf_counter() - t0

    t1, t2 = rd(), rd()
    try:
        os.unlink(p)
    except OSError:
        pass
    return {
        "first_read_s": round(t1, 3),
        "cached_read_s": round(t2, 3),
        "cached_gb": _cached_gb(),
        # either read at disk speed flags reclaim: a slow SECOND read
        # means pages are being evicted as they fault in right now; a
        # slow FIRST read means the just-written (and synced) file was
        # already evicted — a burst between write and read (observed in
        # the second r9 record: first_read 0.62 s, cached_read 0.04 s,
        # while the aged loop it bracketed was cache-starved 6x)
        "reclaim_active": t1 > 0.5 or t2 > 0.5,
    }


class _ReclaimMonitor:
    """Continuous page-cache eviction sampler (r9, third record): the
    bracketing probes kept reading clean while whole PASSES between them
    ran 1.5-2x slow — bursty reclaim dodges point probes.  This thread
    re-reads a 16 MB canary every ~2 s for the WHOLE run; a read over
    50 ms (RAM re-read is ~3 ms, disk ~150 ms) means the canary was
    evicted since the last sample.  The record gets a duty cycle
    (evicted samples / samples) instead of three instants; >5% gates
    the record."""

    def __init__(self, tmpdir: str, period_s: float = 2.0):
        import threading

        self.path = os.path.join(tmpdir, "reclaim_canary.bin")
        with open(self.path, "wb") as fh:
            fh.write(os.urandom(1 << 24))
        os.sync()
        self.period = period_s
        self.samples = 0
        self.evicted = 0
        self.max_read_s = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self) -> None:
        # first read repopulates cache after the sync; not counted
        self._read()
        while not self._stop.wait(self.period):
            dt = self._read()
            if dt < 0:
                return  # canary unlinked (teardown)
            self.samples += 1
            self.max_read_s = max(self.max_read_s, dt)
            if dt > 0.05:
                self.evicted += 1

    def _read(self) -> float:
        t0 = time.perf_counter()
        try:
            with open(self.path, "rb") as fh:
                while fh.read(1 << 22):
                    pass
        except OSError:
            return -1.0
        return time.perf_counter() - t0

    def stop(self) -> dict:
        self._stop.set()
        self._t.join(timeout=5)
        duty = round(100 * self.evicted / self.samples, 1) if self.samples else 0.0
        return {
            "samples": self.samples,
            "evicted_samples": self.evicted,
            "duty_pct": duty,
            "max_read_s": round(self.max_read_s, 3),
            # compare UNROUNDED (r10: a 5.04% duty rounds to the displayed
            # 5.0 and `duty > 5.0` would miss it)
            "reclaim_bursty": (
                self.samples > 0 and self.evicted > 0.05 * self.samples
            ),
        }


def _steal_jiffies() -> int:
    """Cumulative hypervisor steal time (jiffies) from /proc/stat — on a
    microVM host, CPU stolen by co-tenants slows every measurement
    UNIFORMLY, which none of the in-VM gates (start load, aged/young
    ratio) can see: no process shows up, both passes slow equally.
    Recording the per-run steal share makes the r6/r8 'everything is
    1.3x slower, nothing changed' pattern adjudicable from the record."""
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])  # cpu: ... steal is field 8
    except (OSError, ValueError, IndexError):
        return 0


# CPU-adjudicated acceptance bands (r11; ARCHITECTURE.md "CPU-adjudicated
# bench records").  The wall band is the operational "no silent
# regression" check against the last COMMITTED record's shared headline
# prefix — r10 attempt 1 measured 1.11 here on a floor-refused window.
# The CPU band is tighter because CPU is the contamination-robust metric:
# page-cache starvation inflates wall (timed re-reads hit virtio disk)
# while iowait charges no CPU, and hypervisor steal inflates wall while
# stolen jiffies are charged to `steal`, not the process.
_WALL_BAND = 1.5
_CPU_BAND = 1.25


def _cpu_adjudicate(
    floor_only: bool,
    steal_pct: float,
    timings: dict[str, float],
    timings_cpu: dict[str, float | None],
) -> dict | None:
    """Alternative write-gate acceptance for the host-balloon mode (r11
    verdict task 1).  Three r10 quiet windows were refused with guest
    Cached pinned at the SAME ~1.3/2.3 GB across every run phase and
    load level — a hard balloon target, so the Cached>=3GB floor is
    likely UNSATISFIABLE on this host and the floor alone must not
    deadlock the committed record forever.  A run whose ONLY tripped
    gate is the cache floor is accepted iff:

      (1) every other sensor is clean — start load, aged-vs-young ratio,
          reclaim probes, bursty-reclaim duty (``floor_only``) — and the
          whole-run hypervisor steal share is <= 2%;
      (2) the median per-query aged-wall ratio vs the committed
          BENCH_LOCAL.json's shared queries is <= _WALL_BAND; and
      (3) if a pinned CPU baseline exists (BENCH_CPU_BASELINE.json), the
          median per-query CPU ratio vs it is <= _CPU_BAND.  The first
          accepted record ESTABLISHES that baseline (flagged in the
          returned dict; main() writes the file alongside the record).

    Returns the adjudication evidence dict on acceptance (embedded in
    the record next to ``contamination_note``; ``load_warning`` stays
    true because the sensor is honest), or None to refuse the write."""
    if not floor_only or steal_pct > 2.0:
        return None
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json")) as fh:
            committed = json.load(fh)["queries"]
    except (OSError, ValueError, KeyError):
        return None  # nothing committed to band against — cannot adjudicate
    ratios = {
        n: round(timings[n] / committed[n], 3)
        for n in timings
        if isinstance(committed.get(n), (int, float)) and committed[n] > 0
    }
    if not ratios:
        return None
    med = statistics.median(ratios.values())
    if med > _WALL_BAND:
        return None
    worst = max(ratios, key=ratios.get)  # sketch_cms_counts watch item
    adj: dict = {
        "rule": "floor-only contamination, steal<=2%, wall median<=1.5 vs "
        "committed, cpu median<=1.25 vs pinned baseline (first acceptance "
        "establishes it) — ARCHITECTURE.md 'CPU-adjudicated bench records'",
        "wall_vs_committed_median": round(med, 3),
        "wall_vs_committed_worst": [worst, ratios[worst]],
        "wall_vs_committed": ratios,
    }
    try:
        with open(os.path.join(here, "BENCH_CPU_BASELINE.json")) as fh:
            base = json.load(fh)["queries_cpu"]
    except (OSError, ValueError, KeyError):
        base = None
    if base:
        cpu_ratios = {
            n: round(timings_cpu[n] / base[n], 3)
            for n in timings_cpu
            if timings_cpu.get(n) and isinstance(base.get(n), (int, float)) and base[n] > 0
        }
        if cpu_ratios:
            cmed = statistics.median(cpu_ratios.values())
            if cmed > _CPU_BAND:
                return None
            cworst = max(cpu_ratios, key=cpu_ratios.get)
            adj["cpu_vs_baseline_median"] = round(cmed, 3)
            adj["cpu_vs_baseline_worst"] = [cworst, cpu_ratios[cworst]]
            adj["cpu_vs_baseline"] = cpu_ratios
    else:
        adj["cpu_baseline_established"] = True
    return adj


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    load_start = os.getloadavg()
    steal0, wall0 = _steal_jiffies(), time.perf_counter()
    # continuous eviction sampler covers the WHOLE run including the
    # young subprocess batches below (its canary lives in its own dir)
    mon_dir = tempfile.mkdtemp(prefix="cph_mon_")
    monitor = _ReclaimMonitor(mon_dir)

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    young: dict[str, float] = {}
    young_cpu: dict[str, float | None] = {}

    # ---- young-session pass FIRST, before this process owns any JVM:
    # each batch of queries runs in a fresh interpreter (own JVM).  The
    # pass used to run after the aged pass, but py4j keeps the parent's
    # JVM (and its aged 48g heap) alive across spark.stop(), and the
    # checkpoint-heavy queries (graph_pagerank, the tokenizer E2E)
    # measured 4-6x slower in children spawned next to that resident
    # heap than in the same batch run standalone (1.23s vs 5.98s,
    # reproduced twice).  Young numbers must see a machine with no
    # parent heap at all.
    # machine-warm child, discarded: the FIRST JVM after an idle box pays
    # one-time costs that belong to the machine, not the query (pyspark
    # jar page-cache faults, cpufreq ramp) — measured as a uniform ~2x on
    # whichever batch ran first, vanishing on a warm re-run of the same
    # batch.  The old ordering hid this because the parent's aged pass
    # paid it.
    if names:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--young-batch",
             sf_dir, names[0]],
            capture_output=True, text=True, timeout=1800,
        )
    for i in range(0, len(names), _YOUNG_BATCH):
        batch = names[i : i + _YOUNG_BATCH]
        # a failed child loses ITS batch's young entries, never the
        # whole record
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--young-batch",
                 sf_dir, ",".join(batch)],
                capture_output=True, text=True, timeout=1800,
            )
            if proc.returncode != 0:
                raise RuntimeError(proc.stdout[-500:] + proc.stderr[-500:])
            got = json.loads(proc.stdout.strip().splitlines()[-1])
            young.update(got["wall"])
            young_cpu.update(got["cpu"])
        except Exception as exc:  # noqa: BLE001
            print(f"young batch {batch[0]}..{batch[-1]} failed: {exc}",
                  file=sys.stderr)

    # fallback=false (r8 verdict task 5): preflight already throws on a
    # janino compile fallback, but a bench session that silently dropped
    # to interpreted evaluation would still record an interpreted plan's
    # timing as if it were the compiled one (exactly how the flagship's
    # 64 KB-span regression stayed invisible for 7 rounds).  Throwing
    # here means a fallback aborts the record instead of polluting it.
    _NO_FALLBACK = {"spark.sql.codegen.fallback": "false"}
    spark = get_spark(app_name="copperhead-bench", extra_conf=_NO_FALLBACK)

    # warmup: run the first query once to pay JVM + codegen startup
    if names:
        queries[names[0]].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    from copperhead_spark.fixtures import events_fixture_distributed
    from copperhead_spark.pipeline import stage1_arrays, stage2_variations

    n_events = max(int(10_000_000 * sf), 10_000) if sf > 0 else 10_000
    tmp = tempfile.mkdtemp(prefix="cph_bench_")

    timings: dict[str, float] = {}
    timings_cpu: dict[str, float | None] = {}
    soak: dict[str, float] = {}
    cache_probe = {"start": _cache_reclaim_probe(tmp)}

    # ONE try/finally covers everything from fixture write to the last
    # measurement: any exception anywhere still rmtrees the up-to-10x
    # events parquet tree
    try:
        # the copperhead-shaped headline: jagged-event stage1+stage2 with
        # the zero-shuffle array-native plan.  Input is materialized
        # parquet (generated executor-side, written once as setup —
        # generation is not what's being measured), 10M events/sf.
        events_fixture_distributed(spark, n_events).write.parquet(f"{tmp}/events")
        ev = spark.read.parquet(f"{tmp}/events")
        # warmup on a small slice: same plan -> Janino codegen cache is
        # hot, so the timed run measures throughput, not compilation
        events_fixture_distributed(spark, 5000).write.parquet(f"{tmp}/warmup")
        wu = spark.read.parquet(f"{tmp}/warmup")
        stage2_variations(stage1_arrays(wu)).write.format("noop").mode(
            "overwrite"
        ).save()
        # the jagged pipeline is the most session-history-sensitive plan
        # here (~2.4s in a young JVM vs ~4.5s after the 28 headline
        # queries, independent of load and of code-cache size).  It is
        # measured TWICE: the carried-forward key keeps its historical
        # tail-of-session position so r01/r02 deltas stay comparable;
        # the _young key records the same plan early in the session so
        # the session-state cost is visible instead of folded into a
        # pseudo-regression.
        pk_young = f"pipeline_jagged_{n_events // 1000}k_events_young"
        timings[pk_young], timings_cpu[pk_young] = _time_pipeline(spark, ev)

        for name in names:
            timings[name], timings_cpu[name] = _time_query_cpu(
                spark, queries[name], sf_dir
            )

        # carried-forward tail-of-session measurement (see note above)
        pk_aged = f"pipeline_jagged_{n_events // 1000}k_events"
        timings[pk_aged], timings_cpu[pk_aged] = _time_pipeline(spark, ev)
        # second reclaim probe bracketing the aged loop: eviction that
        # begins mid-run contaminates the tail measurements only
        cache_probe["after_aged"] = _cache_reclaim_probe(tmp)

        # (the young-session counterpart pass runs FIRST in main(), before
        # this process owns a JVM — see the note there; it used to run
        # here, between the aged pass and the soaks)

        # ---- 10x soak ------------------------------------------------
        # jagged pipeline at 10x the headline event count (100M-row scale
        # shape at sf0.1) on its own fresh context.  Near-linear scaling
        # vs the 1M young number is the pass condition; super-linear
        # growth flags a memory-shape problem (agg width, HOF codegen)
        # that a 100 TB scan would amplify.
        if sf >= 0.1:
            spark.stop()
            spark = get_spark(app_name="copperhead-bench-soak", extra_conf=_NO_FALLBACK)
            n_soak = n_events * 10
            events_fixture_distributed(spark, n_soak).write.parquet(f"{tmp}/soak")
            ev10 = spark.read.parquet(f"{tmp}/soak")
            wu = spark.read.parquet(f"{tmp}/warmup")
            stage2_variations(stage1_arrays(wu)).write.format("noop").mode(
                "overwrite"
            ).save()
            t, t_cpu = _time_pipeline(spark, ev10)
            soak[f"pipeline_jagged_{n_soak // 1000}k_events"] = t
            if t_cpu is not None:
                soak[f"pipeline_jagged_{n_soak // 1000}k_events_cpu"] = t_cpu
            yk = f"pipeline_jagged_{n_events // 1000}k_events_young"
            if timings.get(yk):
                soak["scaling_vs_young_1x"] = round(t / (10 * timings[yk]), 3)

            # ---- dedup soak: 10x documents through the banded minhash
            # path (each doc spawns 10 near-identical variants — the
            # duplicate-heavy corpus shape dedup exists for, so the LSH
            # pair volume grows SUPER-linearly while the plan must stay
            # sub-linear per doc: banding groupBy + bucket-mate joins
            # only).  Ratios are vs a same-session 1x run: > 1.0 means
            # the banded path degraded super-linearly per doc.
            docs1 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            (
                docs1.selectExpr("explode(sequence(0, 9)) AS rep", "doc_id", "text")
                .selectExpr(
                    "doc_id * 10 + rep AS doc_id",
                    "concat(text, ' v', CAST(rep AS STRING)) AS text",
                )
                .write.mode("overwrite")
                .parquet(f"{tmp}/dedup10x/documents.parquet")
            )
            dup10 = {}
            for qn in ("dedup_minhash_signatures", "dedup_minhash_lsh_pairs"):
                one = _time_query(spark, queries[qn], sf_dir)
                ten = _time_query(spark, queries[qn], f"{tmp}/dedup10x")
                dup10[qn] = ten
                soak[f"{qn}_10x_docs"] = ten
                soak[f"{qn}_scaling_vs_1x"] = round(ten / (10 * one), 3)

            # ---- clean-corpus counterpart: same 10x doc count, but each
            # replica Caesar-rotates the FULL 26-letter alphabet by rep
            # (rep 0 keeps the original text), a per-replica bijection:
            # within a replica all pairwise Jaccards are EXACTLY the
            # base corpus's (shingle sets map 1:1), while across
            # replicas every letter-bearing 5-gram changes, driving
            # cross-replica Jaccard ~ 0.  (A 9-letter rotation was not
            # enough: shingles with none of those letters survived
            # verbatim and cross-replica band collisions kept ~70% of
            # the pair volume.)  This is the common 100 TB shape —
            # almost no true duplicates — and pins the claim that LSH
            # pair cost tracks TRUE duplicate density, not corpus size:
            # the cross-replica pair count recorded below should be ~0
            # here vs millions on the duplicate-heavy corpus.
            _AL = "abcdefghijklmnopqrstuvwxyz"
            (
                docs1.selectExpr("explode(sequence(0, 9)) AS rep", "doc_id", "text")
                .selectExpr(
                    "doc_id * 10 + rep AS doc_id",
                    f"translate(text, '{_AL}',"
                    f" substring(repeat('{_AL}', 2), rep + 1, 26)) AS text",
                )
                .write.mode("overwrite")
                .parquet(f"{tmp}/dedup10x_clean/documents.parquet")
            )
            clean10 = {}
            for qn in ("dedup_minhash_signatures", "dedup_minhash_lsh_pairs"):
                clean10[qn] = _time_query(spark, queries[qn], f"{tmp}/dedup10x_clean")
            soak["dedup_minhash_signatures_clean_10x"] = clean10[
                "dedup_minhash_signatures"
            ]
            soak["dedup_minhash_lsh_pairs_clean_10x"] = clean10[
                "dedup_minhash_lsh_pairs"
            ]
            # pairs-stage isolation: lsh_pairs includes the signature
            # computation, so subtract the signature-only timing
            ps_clean = max(
                clean10["dedup_minhash_lsh_pairs"]
                - clean10["dedup_minhash_signatures"],
                0.0,
            )
            ps_dup = max(
                dup10["dedup_minhash_lsh_pairs"] - dup10["dedup_minhash_signatures"],
                0.0,
            )
            soak["pairs_stage_clean_est"] = round(ps_clean, 4)
            soak["pairs_stage_dup_est"] = round(ps_dup, 4)
            if ps_dup > 0:
                soak["pairs_stage_clean_vs_dup"] = round(ps_clean / ps_dup, 3)
            # pair VOLUME is the scale-relevant quantity (at bench scale
            # the pairs-stage time has a duplicate-independent floor:
            # the banding shuffle is linear in docs).  The density claim
            # is pinned by the CROSS-replica pair count — the volume the
            # banding spends on candidates that exist only because of
            # true duplication: ~0 on the clean corpus (measured: 1 pair
            # at sf0.1) vs millions on the duplicate-heavy one.  Raw
            # totals are also recorded, but same-replica volume is
            # lexicon-luck-sensitive at this tiny synthetic vocabulary
            # (whichever shingle draws the minimum hash may sit in every
            # doc), so cross-rep is the stable scale signal.
            qp = queries["dedup_minhash_lsh_pairs"]
            soak["lsh_pairs_n_base"] = qp.builder(spark, sf_dir).count()
            for lbl, d in (("dup10x", "dedup10x"), ("clean10x", "dedup10x_clean")):
                br = (
                    qp.builder(spark, f"{tmp}/{d}")
                    .selectExpr(
                        "CAST(doc1 % 10 = doc2 % 10 AS INT) AS same_rep"
                    )
                    .groupBy("same_rep")
                    .count()
                    .collect()
                )
                by = {r["same_rep"]: r["count"] for r in br}
                soak[f"lsh_pairs_n_{lbl}"] = by.get(0, 0) + by.get(1, 0)
                soak[f"lsh_pairs_n_{lbl}_cross_rep"] = by.get(0, 0)

            # ---- prefix-filter soak: the EXACT similarity join on
            # replicas of ITS OWN corpus slice (the operator reads every
            # 10th doc; replica ids are orig*100 + rep*10 — all
            # divisible by 10, so the in-plan filter passes exactly the
            # replicated slice.  A first cut re-mapped the full dedup10x
            # corpus, let 100x the docs through, and ground for >10
            # min).  Two corpora: clean10x (10 Caesar-rotated replicas:
            # docs 10x, TRUE pairs ~1x per replica, cross ~0 — the 100
            # TB shape) and dup3x (3 near-identical replicas: true-pair
            # volume ~9x base — exact joins MUST verify every true pair,
            # so work here is pair-bound by definition; 10 replicas =
            # 100x pairs = 254 s, measured, which is why the dup factor
            # is 3).  Result-pair counts are recorded so the time
            # ratios have their denominators next to them.
            pf = queries["dedup_prefix_filter_pairs"]
            pf_base = _time_query(spark, pf, sf_dir)
            soak["prefix_filter_pairs_n_base"] = pf.builder(spark, sf_dir).count()
            pf_slice10 = docs1.filter("doc_id % 10 = 0").selectExpr(
                "explode(sequence(0, 9)) AS rep", "doc_id", "text"
            )
            pf_slice10.selectExpr(
                "doc_id * 100 + rep * 10 AS doc_id",
                f"translate(text, '{_AL}',"
                f" substring(repeat('{_AL}', 2), rep + 1, 26)) AS text",
            ).write.mode("overwrite").parquet(
                f"{tmp}/pf_clean10x/documents.parquet"
            )
            docs1.filter("doc_id % 10 = 0").selectExpr(
                "explode(sequence(0, 2)) AS rep", "doc_id", "text"
            ).selectExpr(
                "doc_id * 100 + rep * 10 AS doc_id",
                "concat(text, ' v', CAST(rep AS STRING)) AS text",
            ).write.mode("overwrite").parquet(
                f"{tmp}/pf_dup3x/documents.parquet"
            )
            for lbl in ("clean10x", "dup3x"):
                d = f"{tmp}/pf_{lbl}"
                soak[f"dedup_prefix_filter_pairs_{lbl}"] = _time_query(
                    spark, pf, d
                )
                soak[f"prefix_filter_pairs_n_{lbl}"] = pf.builder(spark, d).count()
            if pf_base > 0:
                soak["dedup_prefix_filter_clean_scaling_vs_1x"] = round(
                    soak["dedup_prefix_filter_pairs_clean10x"] / (10 * pf_base), 3
                )
                soak["dedup_prefix_filter_dup3x_vs_1x"] = round(
                    soak["dedup_prefix_filter_pairs_dup3x"] / (3 * pf_base), 3
                )

            # ---- graph 10x soak: pagerank on 10 disconnected offset
            # copies of the bipartite graph.  Pass condition:
            # near-linear in edges — each iteration's frontier join must
            # stay SHUFFLE_HASH against the edge list's (checkpointed)
            # src partitioning at any multiple; super-linear growth
            # would mean the loop re-shuffles or broadcasts the edge
            # side, exactly the failure a 1000-executor graph hits.
            from copperhead_spark.plans.graph import (
                _ITERS,
                _edges_deg,
                pagerank_iterations,
            )

            def _pr_time(e, d) -> float:
                _gc.collect()
                spark._jvm.System.gc()
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    pagerank_iterations(e, d, _ITERS).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                return round(best, 4)

            ed, deg = _edges_deg(spark, sf_dir)
            t1g = _pr_time(ed, deg)
            ed10 = (
                ed.select("src", "dst")
                .selectExpr("explode(sequence(0, 9)) AS rep", "src", "dst")
                .selectExpr(
                    "src + rep * 100000000 AS src",
                    "dst + rep * 100000000 AS dst",
                )
                .selectExpr(
                    "src",
                    "dst",
                    "COUNT(*) OVER (PARTITION BY src) AS deg",
                )
                .localCheckpoint()
            )
            deg10 = ed10.select("src", "deg").distinct().localCheckpoint()
            t10g = _pr_time(ed10, deg10)
            soak["graph_pagerank_10x_edges"] = t10g
            soak["graph_pagerank_scaling_vs_1x"] = round(t10g / (10 * t1g), 3)

            # ---- skew soak (r5 task 6): the 10x soaks above all run
            # near-uniform keys; a 100 TB web corpus is Zipf.  Build a
            # power-law edge list at the SAME 10x edge count — src drawn
            # by Pareto inverse-CDF floor(1/u), i.e. Zipf(alpha=2), so
            # the hottest node owns ~50% of ALL edges — and run the same
            # frontier-join pagerank and LPA loops.  The zipf-vs-uniform
            # ratio at equal edge count isolates what the hot key costs;
            # the decision-rule record shows what a production pipeline
            # would DO about it (operators/skew.choose_skew_strategy fed
            # by the dq_skew_profile numbers measured here).
            from copperhead_spark.operators.skew import choose_skew_strategy
            from copperhead_spark.plans.graph import _LP_ROUNDS, lpa_iterations

            n_e10 = ed10.count()
            zipf_ed = (
                spark.range(n_e10)
                .selectExpr(
                    # u in (0,1]; floor(1/u) capped at 100k nodes
                    "least(CAST(1.0 / ((CAST(pmod(xxhash64(id * 31), 1000000)"
                    " AS DOUBLE) + 1.0) / 1000000.0) AS BIGINT), 100000) AS src",
                    "pmod(xxhash64(id), 100000) + 200000 AS dst",
                )
                .selectExpr(
                    "src", "dst", "COUNT(*) OVER (PARTITION BY src) AS deg"
                )
                .localCheckpoint()
            )
            zipf_deg = zipf_ed.select("src", "deg").distinct().localCheckpoint()
            # profile the join key exactly as dq_skew_profile would
            kcounts = zipf_ed.groupBy("src").count()
            top_cnt, n_keys = (
                kcounts.selectExpr(
                    "max(count) AS top", "count(*) AS nk"
                ).first()
            )
            soak["zipf_edges_n"] = n_e10
            soak["zipf_top_src_share_ppm"] = int(top_cnt * 1_000_000 // n_e10)
            strat, n_salts = choose_skew_strategy(
                int(top_cnt), int(n_e10), int(n_keys)
            )
            # rule verdict for the frontier join (rank side is |nodes|-
            # sized: broadcastable at bench SF, NOT at 100 TB -> the
            # record carries the scale-relevant no-dim-info verdict)
            soak["zipf_rule_is_salt"] = 1 if strat == "salt" else 0
            soak["zipf_rule_n_salts"] = n_salts
            t_zpr = _pr_time(zipf_ed, zipf_deg)
            soak["graph_pagerank_zipf10x_edges"] = t_zpr
            soak["graph_pagerank_zipf_vs_uniform10x"] = round(t_zpr / t10g, 3)
            # did AQE's skew-join splitting engage?  (At bench SF the
            # honest answer is no: skewedPartitionThresholdInBytes
            # defaults to 256 MB and the hot partition here is ~MBs.
            # The plan string is checked, not assumed.)
            pr_df = pagerank_iterations(zipf_ed, zipf_deg, 1)
            pr_df.write.format("noop").mode("overwrite").save()
            plan_str = pr_df._jdf.queryExecution().executedPlan().toString()
            soak["zipf_aqe_skew_engaged"] = 1 if "skew=true" in plan_str else 0

            def _lpa_time(e, d) -> float:
                _gc.collect()
                spark._jvm.System.gc()
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    lpa_iterations(e, d, _LP_ROUNDS).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                return round(best, 4)

            soak["graph_lpa_10x_edges"] = _lpa_time(ed10, deg10)
            soak["graph_lpa_zipf10x_edges"] = _lpa_time(zipf_ed, zipf_deg)
            soak["graph_lpa_zipf_vs_uniform10x"] = round(
                soak["graph_lpa_zipf10x_edges"] / soak["graph_lpa_10x_edges"], 3
            )

            # hot-BUCKET LSH: every 10th doc replaced by ONE constant
            # text -> one band bucket holds 10% of the corpus and the
            # pair stage must emit C(n/10, 2) pairs through it.  Time +
            # pair count + the bucket-occupancy profile and the rule's
            # verdict (at scale the mitigation is bucket-size capping /
            # salting the bucket join — the rule flags it).
            docs1.selectExpr(
                "doc_id",
                "CASE WHEN doc_id % 10 = 0 THEN"
                " 'hot viral boilerplate page body repeated verbatim across mirrors'"
                " ELSE text END AS text",
            ).write.mode("overwrite").parquet(f"{tmp}/lsh_hot/documents.parquet")
            soak["dedup_minhash_lsh_pairs_hotkey"] = _time_query(
                spark, qp, f"{tmp}/lsh_hot"
            )
            soak["lsh_pairs_n_hotkey"] = qp.builder(
                spark, f"{tmp}/lsh_hot"
            ).count()
            sig_q = queries["dedup_minhash_signatures"]
            bands = sig_q.builder(spark, f"{tmp}/lsh_hot").selectExpr(
                "stack(4, "
                "0, concat(mh0, '_', mh1), 1, concat(mh2, '_', mh3), "
                "2, concat(mh4, '_', mh5), 3, concat(mh6, '_', mh7)"
                ") AS (band, bk)"
            )
            bprof = bands.groupBy("band", "bk").count()
            btop, bkeys, brows = bprof.selectExpr(
                "max(count) AS top", "count(*) AS nk", "sum(count) AS nr"
            ).first()
            soak["lsh_hot_top_bucket_docs"] = int(btop)
            bstrat, bsalts = choose_skew_strategy(
                int(btop), int(brows), int(bkeys)
            )
            soak["lsh_hot_rule_is_salt"] = 1 if bstrat == "salt" else 0
            soak["lsh_hot_rule_n_salts"] = bsalts

            # ---- ANN 10x soak: the full vector-store e2e (kmeans index
            # build -> IVF+PQ probe -> ADC -> exact rerank -> recall
            # gate) on 10x the embedding corpus (each replica slightly
            # perturbed so vectors are distinct).  Build is linear in
            # corpus; the probe reads only the probed cells' codes —
            # the ratio pins that the whole chain stays ~linear per
            # vector instead of degrading toward the n^2 brute-force.
            emb1 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            (
                emb1.selectExpr(
                    "explode(sequence(0, 9)) AS rep",
                    "vec_id",
                    "embedding",
                    "label",
                )
                .selectExpr(
                    "vec_id * 10 + rep AS vec_id",
                    "transform(embedding,"
                    " x -> CAST(x + rep * 0.0009765625 AS FLOAT)) AS embedding",
                    "label",
                )
                .write.mode("overwrite")
                .parquet(f"{tmp}/ann10x/embeddings.parquet")
            )
            qa = queries["pipeline_ann_query_e2e"]
            t1a = _time_query(spark, qa, sf_dir)
            t10a = _time_query(spark, qa, f"{tmp}/ann10x")
            soak["pipeline_ann_query_e2e_10x_vecs"] = t10a
            soak["pipeline_ann_query_e2e_scaling_vs_1x"] = round(
                t10a / (10 * t1a), 3
            )

            # ---- the r7 flagship: six-stage pretraining-corpus assembly
            # (quality -> lang-ID -> fuzzy dedup -> decontamination ->
            # mixture -> packing) measured once per record — too heavy
            # for the 4x headline loop (~12s at sf0.1), exactly right as
            # a tracked soak number — plus a 3x-clean-corpus scaling
            # point (Caesar replicas: true-dup density ~1x per replica,
            # cross ~0 — the 100 TB shape) pinning that the six-stage
            # COMPOSITION stays sub-linear per doc, not just each stage.
            qe2e = queries["pipeline_pretrain_corpus_e2e"]
            t1e = _time_query(spark, qe2e, sf_dir)
            soak["pipeline_pretrain_corpus_e2e"] = t1e
            (
                docs1.selectExpr(
                    "explode(sequence(0, 2)) AS rep",
                    "doc_id", "text", "lang", "source", "n_chars",
                )
                .selectExpr(
                    "doc_id * 3 + rep AS doc_id",
                    f"translate(text, '{_AL}',"
                    f" substring(repeat('{_AL}', 2), rep + 1, 26)) AS text",
                    "lang", "source", "n_chars",
                )
                .write.mode("overwrite")
                .parquet(f"{tmp}/pretrain3x/documents.parquet")
            )
            t3e = _time_query(spark, qe2e, f"{tmp}/pretrain3x")
            soak["pipeline_pretrain_corpus_e2e_3x_clean"] = t3e
            soak["pipeline_pretrain_corpus_e2e_scaling_vs_1x"] = round(
                t3e / (3 * t1e), 3
            )

            # ---- the r10 stage-3 flagship: two pipeline passes (ROOT
            # scan -> stage1 -> histogram + exact anchors) feeding the
            # six-family chi2 fits driver-side — too heavy for the 4x
            # headline loop (~10s at sf0.1), measured once per record
            # with its CPU column (the driver-side fit work is the CPU-
            # heavy part, so wall-vs-CPU separates fit cost from scan
            # starvation here too)
            tfit, cfit = _time_query_cpu(
                spark, queries["pipeline_root_to_fit_e2e"], sf_dir
            )
            soak["pipeline_root_to_fit_e2e"] = tfit
            if cfit is not None:
                soak["pipeline_root_to_fit_e2e_cpu"] = cfit
        # third probe bracketing the soaks: a burst that starved only
        # the soak section leaves both run-level probes clean
        cache_probe["after_soak"] = _cache_reclaim_probe(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        # sampler join + canary dir cleanup belong in the same finally:
        # an exception in the bench body used to skip both, leaking the
        # 16 MB canary in /tmp (r9 ADVICE)
        reclaim_monitor = monitor.stop()
        shutil.rmtree(mon_dir, ignore_errors=True)

    # aged-pass contamination self-check: the aged loop (warm JVM, hot
    # codegen caches, best-of-2) must not be slower IN AGGREGATE than
    # the same queries timed in cold fresh processes — every clean
    # record measures 0.80-0.90 here.  A ratio > 1.0 means an external
    # burst hit the aged loop mid-run (r7 adjudication: a contiguous
    # block of adjacent headline queries at 4-8x with full recovery
    # after — invisible to the START-load gate).  A genuine plan
    # regression moves BOTH passes equally, so it cannot trip this.
    _common = [q for q in young if q in timings]
    _ysum = sum(young[q] for q in _common)
    aged_vs_young = (
        round(sum(timings[q] for q in _common) / _ysum, 3)
        if _common and _ysum > 0
        else None
    )

    # named gate causes (r11): each contamination sensor gets its own
    # flag so the CPU-adjudicated acceptance path can reason about WHICH
    # gate tripped, not just that one did
    steal_pct = round(
        100
        * (_steal_jiffies() - steal0)
        / (max(time.perf_counter() - wall0, 1e-9) * (os.cpu_count() or 1) * 100),
        2,
    )
    gate_start_load = load_start[0] > 2.0 or load_start[1] > 2.0
    gate_aged_young = aged_vs_young is not None and aged_vs_young > 1.0
    gate_reclaim_probe = any(p["reclaim_active"] for p in cache_probe.values())
    gate_reclaim_bursty = bool(reclaim_monitor["reclaim_bursty"])
    gate_cache_floor = sf >= 0.1 and any(
        0 <= cache_probe[k]["cached_gb"] < 3.0
        for k in ("after_aged", "after_soak")
        if k in cache_probe
    )

    # Key order matters: the external harness keeps only the TAIL of
    # stdout, so the per-query dicts go first and the summary scalars
    # (metric/value/sf/load) go LAST — a tail-truncated capture still
    # retains the total, the young pass, the soak, and the load record.
    # The complete record is also written to BENCH_LOCAL.json so the
    # full history survives in-repo regardless of driver capture.
    out = {
        "queries": timings,
        # r10: process-tree CPU seconds (driver + JVM + UDF workers) of
        # each query's best-wall attempt, keyed like "queries"/"queries_
        # young".  Wall >> CPU with CPU at its historical level = host
        # I/O starvation; both up together = a compute regression — the
        # adjudication every r9 record needed probes and diffs to make.
        "queries_cpu": timings_cpu,
        "queries_young": young,
        "queries_young_cpu": young_cpu,
        "soak": soak,
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": sf,
        # r05+: young batches run in fresh interpreter processes (own
        # JVM), so young numbers now include true session-startup costs
        # (C2 JIT warm-in, Python import of arrow/pandas in UDF queries,
        # shared-cache builds) that r04's context-restart young pass
        # inherited for free from the aged JVM.  Compare young-to-young
        # only within the same isolation mode.
        "young_isolation": "process",
        # r9: every bench session (aged, young batches, soaks) runs with
        # spark.sql.codegen.fallback=false — a janino compile fallback
        # now aborts the run instead of silently timing the interpreted
        # plan (the mechanism that hid the flagship's 64 KB-span tax for
        # seven rounds of records)
        "codegen_fallback": False,
        "load_avg": {
            "start": [round(x, 2) for x in load_start],
            "end": [round(x, 2) for x in os.getloadavg()],
        },
        # hypervisor steal share over the whole run (% of one vCPU-second
        # stolen per vCPU-second elapsed, USER_HZ=100): >~2% means a host
        # co-tenant taxed every measurement uniformly — the contamination
        # mode the start-load and aged/young gates cannot see
        "cpu_steal_pct": steal_pct,
        "aged_vs_young_ratio": aged_vs_young,
        # r9: host page-cache reclaim detection (see _cache_reclaim_probe
        # and _ReclaimMonitor — point probes plus a whole-run duty cycle)
        "cache_probe": cache_probe,
        "reclaim_monitor": reclaim_monitor,
        # start load > 2 on the 1-minute OR the 5-minute average means
        # timings are contaminated by background work (the r04
        # a1_count_per_group watch item).  The 5-minute check is r6's
        # lesson: that record passed the 1-min gate (1.91) while the
        # 5-min average was 3.0 — a box busy two minutes earlier — and
        # regressed 6-12% on queries whose code never changed.  The
        # aged/young check is r7's: start gates cannot see MID-run
        # bursts, but the warm-vs-cold aggregate ratio can.
        # cache floor (r9, fourth record): a HOT 16 MB canary survives
        # balloon reclaim (0.4% duty) while the workload's COLD gigabytes
        # (pyspark jars, fixtures, sf tables) cannot stay resident —
        # Cached never exceeding ~2 GB mid-bench at sf>=0.1 means every
        # re-read is a disk read regardless of what the probes say.  A
        # healthy sf0.1 run holds 4-15 GB of page cache after the aged
        # loop.
        # cached_gb < 0 is the "/proc/meminfo unreadable" sentinel, not a
        # starved cache — the floor flag skips the sentinel rather than
        # folding it into the comparison (r9 ADVICE: a non-Linux host
        # would refuse every record with a misleading cause otherwise)
        "load_warning": gate_start_load
        or gate_aged_young
        or gate_reclaim_probe
        or gate_reclaim_bursty
        or gate_cache_floor,
    }
    # CPU-adjudicated acceptance (r11): the floor alone must not deadlock
    # the committed record on a host whose balloon pins Cached below the
    # floor forever — see _cpu_adjudicate for the rule and evidence bands
    if out["load_warning"]:
        adjudication = _cpu_adjudicate(
            floor_only=gate_cache_floor
            and not (
                gate_start_load
                or gate_aged_young
                or gate_reclaim_probe
                or gate_reclaim_bursty
            ),
            steal_pct=steal_pct,
            timings=timings,
            timings_cpu=timings_cpu,
        )
        if adjudication is not None:
            floors = {
                k: cache_probe[k]["cached_gb"]
                for k in ("after_aged", "after_soak")
                if k in cache_probe
            }
            out["cpu_adjudicated"] = True
            out["adjudication"] = adjudication
            out["contamination_note"] = (
                "page-cache floor tripped ("
                + ", ".join(f"Cached@{k}={v}GB" for k, v in floors.items())
                + " < 3.0 floor) on an otherwise-quiet window — the hard "
                "host-balloon mode (ARCHITECTURE.md r10 adjudication): "
                "wall times include re-read inflation, CPU columns do "
                "not; record accepted under the CPU-adjudicated rule"
            )
    line = json.dumps(out)
    # sf-suffixed filename: a smoke run at sf0.001 must not clobber the
    # committed sf0.1 round record (that exact clobber happened once);
    # BENCH_LOCAL.json stays the canonical name for the driver's sf.
    fname = "BENCH_LOCAL.json" if sf >= 0.1 else f"BENCH_LOCAL_sf{sf}.json"
    if out["load_warning"] and not out.get("cpu_adjudicated"):
        # HARD write-gate (r5 verdict task 2): a contaminated run must
        # never become the committed record — the r5 "quiet-box" record
        # landed with load_warning: true and its two apparent regressions
        # were unadjudicable.  The stdout line still carries the data.
        # name the gate that actually tripped (r7 ADVICE: the ratio gate
        # can fire on a clean start load, so a start-load message there
        # is a false diagnostic)
        causes = []
        if load_start[0] > 2.0 or load_start[1] > 2.0:
            causes.append(
                f"start load 1-min {load_start[0]:.2f} / "
                f"5-min {load_start[1]:.2f} exceeds 2.0"
            )
        if aged_vs_young is not None and aged_vs_young > 1.0:
            causes.append(
                f"aged_vs_young ratio {aged_vs_young:.3f} > 1.0 "
                "(mid-run burst: warm-aged pass slower than cold-young)"
            )
        for where, p in cache_probe.items():
            if p["reclaim_active"]:
                causes.append(
                    f"host page-cache reclaim active at {where} "
                    f"(probe cached-read {p['cached_read_s']}s, "
                    f"Cached {p['cached_gb']}GB — timed re-reads hit disk)"
                )
        if reclaim_monitor["reclaim_bursty"]:
            causes.append(
                f"bursty page-cache reclaim: canary evicted in "
                f"{reclaim_monitor['duty_pct']}% of 2s samples "
                f"(max re-read {reclaim_monitor['max_read_s']}s)"
            )
        for k in ("after_aged", "after_soak"):
            if sf >= 0.1 and k in cache_probe and 0 <= cache_probe[k]["cached_gb"] < 3.0:
                causes.append(
                    f"page cache starved at {k}: Cached "
                    f"{cache_probe[k]['cached_gb']}GB < 3GB floor — the "
                    "workload's cold gigabytes cannot stay resident"
                )
        print(
            f"# load_warning: {'; '.join(causes)} — refusing to write {fname}",
            file=sys.stderr,
        )
    else:
        if out.get("cpu_adjudicated"):
            print(
                f"# cpu_adjudicated: {out['contamination_note']}",
                file=sys.stderr,
            )
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, fname), "w") as fh:
                fh.write(line + "\n")
            if out.get("cpu_adjudicated") and out["adjudication"].get(
                "cpu_baseline_established"
            ):
                # first accepted record pins the contamination-robust CPU
                # numbers as the band every later adjudication checks
                with open(os.path.join(here, "BENCH_CPU_BASELINE.json"), "w") as fh:
                    json.dump(
                        {
                            "queries_cpu": {
                                k: v for k, v in timings_cpu.items() if v
                            },
                            "source": f"first cpu-adjudicated {fname} (sf={sf}); "
                            "wall median vs committed "
                            f"{out['adjudication']['wall_vs_committed_median']}",
                        },
                        fh,
                        indent=1,
                    )
                    fh.write("\n")
        except OSError:
            pass  # read-only checkout: stdout line is still the contract
    print(line)


def _soak100_main() -> None:
    """100M-event jagged-pipeline soak (r6 verdict task 7) — one decade
    past the per-round 10M soak, run on demand (`python bench.py
    --soak100`) because generation + two timed passes cost ~10 min,
    which does not belong in every round's record.  Writes
    BENCH_SOAK100.json: wall time, per-unit scaling vs the committed
    10M number, JVM heap high-water, and stage-level shuffle/spill
    bytes from the status store — the numbers that expose the next
    resource ceiling before a real cluster does."""
    load_start = os.getloadavg()
    steal0, wall0 = _steal_jiffies(), time.perf_counter()
    spark = get_spark(
        app_name="copperhead-bench-soak100",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    from copperhead_spark.fixtures import events_fixture_distributed
    from copperhead_spark.pipeline import stage1_arrays, stage2_variations

    n = 100_000_000
    tmp = tempfile.mkdtemp(prefix="cph_soak100_")
    out: dict = {
        "n_events": n,
        "load_avg_start": [round(x, 2) for x in load_start],
        "codegen_fallback": False,
    }
    try:
        t0 = time.perf_counter()
        events_fixture_distributed(spark, n).write.parquet(f"{tmp}/events")
        out["gen_write_sec"] = round(time.perf_counter() - t0, 2)
        ev = spark.read.parquet(f"{tmp}/events")
        out["input_bytes"] = sum(
            f.stat().st_size
            for f in os.scandir(f"{tmp}/events")
            if f.name.endswith(".parquet")
        )
        # warmup on a small slice so codegen is not in the timed window
        events_fixture_distributed(spark, 5000).write.parquet(f"{tmp}/wu")
        wu = spark.read.parquet(f"{tmp}/wu")
        stage2_variations(stage1_arrays(wu)).write.format("noop").mode(
            "overwrite"
        ).save()
        best: tuple[float, float | None] = (float("inf"), None)
        for _ in range(2):
            _gc.collect()
            spark._jvm.System.gc()
            c0 = _tree_cpu_s()
            t0 = time.perf_counter()
            stage2_variations(stage1_arrays(ev)).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            c1 = _tree_cpu_s()
            if wall < best[0]:
                cpu = None if c0 is None or c1 is None else round(c1 - c0, 4)
                best = (wall, cpu)
        out["pipeline_jagged_100000k_events"] = round(best[0], 4)
        out["pipeline_jagged_100000k_events_cpu"] = best[1]
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        out["jvm_heap_used_gb"] = round(
            (rt.totalMemory() - rt.freeMemory()) / 2**30, 2
        )
        out["jvm_heap_max_gb"] = round(rt.maxMemory() / 2**30, 2)
        # GC share of the timed window: the 10M->100M per-unit rise has
        # no spill/shuffle signature, so the first suspects are GC churn
        # from the jagged-array row shape vs plain scan IO — measure it
        gcs = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        gc_before_ms = sum(
            gcs.get(i).getCollectionTime() for i in range(gcs.size())
        )
        _gc.collect()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        stage2_variations(stage1_arrays(ev)).write.format("noop").mode(
            "overwrite"
        ).save()
        gc_run_sec = time.perf_counter() - t0
        gc_after_ms = sum(
            gcs.get(i).getCollectionTime() for i in range(gcs.size())
        )
        out["gc_probe_run_sec"] = round(gc_run_sec, 2)
        out["gc_probe_gc_sec"] = round((gc_after_ms - gc_before_ms) / 1000, 2)
        out["gc_share_pct"] = round(
            100 * (gc_after_ms - gc_before_ms) / 1000 / gc_run_sec, 1
        )
        try:
            store = spark._jsc.sc().statusStore()
            # py4j cannot use Scala default args: fetch each default
            # explicitly (stageList(statuses, quantiles, taskStatus,
            # withSummaries, unsortedQuantiles) in Spark 4)
            defaults = [
                getattr(store, f"stageList$default${i}")() for i in range(2, 6)
            ]
            stages = store.stageList(spark._jvm.java.util.ArrayList(), *defaults)
            spill_mem = spill_disk = sh_read = sh_write = 0
            for i in range(stages.size()):
                s = stages.apply(i)
                spill_mem += s.memoryBytesSpilled()
                spill_disk += s.diskBytesSpilled()
                sh_read += s.shuffleReadBytes()
                sh_write += s.shuffleWriteBytes()
            out["memory_spill_gb"] = round(spill_mem / 2**30, 3)
            out["disk_spill_gb"] = round(spill_disk / 2**30, 3)
            out["shuffle_read_gb"] = round(sh_read / 2**30, 3)
            out["shuffle_write_gb"] = round(sh_write / 2**30, 3)
        except Exception as exc:  # noqa: BLE001 - metrics are best-effort
            out["status_store_err"] = str(exc)[:200]
        out["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]
        out["cpu_steal_pct"] = round(
            100 * (_steal_jiffies() - steal0)
            / (max(time.perf_counter() - wall0, 1e-9) * (os.cpu_count() or 1) * 100),
            2,
        )
        # per-unit scaling vs the committed per-round 10x record
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
                )
            ) as fh:
                prior = json.load(fh)["soak"].get("pipeline_jagged_10000k_events")
            if prior:
                out["scaling_vs_10m"] = round(
                    out["pipeline_jagged_100000k_events"] / (10 * prior), 3
                )
        except (OSError, ValueError, KeyError):
            pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    line = json.dumps(out)
    if load_start[0] > 2.0 or load_start[1] > 2.0:
        # same hard write-gate as the main record: a contaminated soak
        # must not clobber a clean one (stdout still carries the data)
        print(
            f"# load_warning: start load {load_start[0]:.2f}/{load_start[1]:.2f}"
            " > 2.0 — refusing to write BENCH_SOAK100.json",
            file=sys.stderr,
        )
    else:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_SOAK100.json"
            ),
            "w",
        ) as fh:
            fh.write(line + "\n")
    print(line)


def _pretrain10x_main() -> None:
    """Multi-scale soak for the pretraining-corpus flagship (r8 verdict
    task 1): time pipeline_pretrain_corpus_e2e at 1x, 3x and 10x the
    sf0.1 documents corpus in ONE gate-clean record, run on demand
    (`python bench.py --pretrain10x`) so the adjudication does not
    depend on the per-round record's box being quiet for the whole run.
    Replicas are Caesar-shifted per copy (the 3x-clean recipe in main):
    true-duplicate density stays ~1x per replica and cross-replica LSH
    pairs ~0 — the 100 TB shape, where corpus growth adds documents, not
    proportionally more duplicates of the same documents.  Writes
    BENCH_PRETRAIN10X.json under the same start-load hard gate as
    BENCH_SOAK100.json."""
    load_start = os.getloadavg()
    steal0, wall0 = _steal_jiffies(), time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="copperhead-bench-pretrain10x",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    queries = all_queries()
    q = queries["pipeline_pretrain_corpus_e2e"]
    tmp = tempfile.mkdtemp(prefix="cph_pre10x_")
    out: dict = {
        "sf_dir": sf_dir,
        "load_avg_start": [round(x, 2) for x in load_start],
        "codegen_fallback": False,
    }
    _al = "abcdefghijklmnopqrstuvwxyz"
    try:
        docs1 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        out["n_docs_1x"] = docs1.count()
        for mult in (3, 10):
            (
                docs1.selectExpr(
                    f"explode(sequence(0, {mult - 1})) AS rep",
                    "doc_id", "text", "lang", "source", "n_chars",
                )
                .selectExpr(
                    f"doc_id * {mult} + rep AS doc_id",
                    f"translate(text, '{_al}',"
                    f" substring(repeat('{_al}', 2), rep + 1, 26)) AS text",
                    "lang", "source", "n_chars",
                )
                .write.mode("overwrite")
                .parquet(f"{tmp}/x{mult}/documents.parquet")
            )
        # warmup: one full run at 1x so codegen/UDF import is outside
        # every timed window
        q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1, c1 = _time_query_cpu(spark, q, sf_dir)
        t3, c3 = _time_query_cpu(spark, q, f"{tmp}/x3")
        t10, c10 = _time_query_cpu(spark, q, f"{tmp}/x10")
        out["pipeline_pretrain_corpus_e2e_1x"] = t1
        out["pipeline_pretrain_corpus_e2e_3x"] = t3
        out["pipeline_pretrain_corpus_e2e_10x"] = t10
        out["pipeline_pretrain_corpus_e2e_1x_cpu"] = c1
        out["pipeline_pretrain_corpus_e2e_3x_cpu"] = c3
        out["pipeline_pretrain_corpus_e2e_10x_cpu"] = c10
        out["scaling_3x_per_unit"] = round(t3 / (3 * t1), 3)
        out["scaling_10x_per_unit"] = round(t10 / (10 * t1), 3)
        out["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]
        out["cpu_steal_pct"] = round(
            100 * (_steal_jiffies() - steal0)
            / (max(time.perf_counter() - wall0, 1e-9) * (os.cpu_count() or 1) * 100),
            2,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    line = json.dumps(out)
    # sf-suffixed filename below the canonical scale (the r5 clobber
    # lesson, same rule as BENCH_LOCAL.json): a sf0.01 smoke run must
    # never pose as the committed sf0.1 adjudication record.
    base = os.path.basename(sf_dir.rstrip("/"))
    fname = (
        "BENCH_PRETRAIN10X.json"
        if base == "sf0.1"
        else f"BENCH_PRETRAIN10X_{base}.json"
    )
    if load_start[0] > 2.0 or load_start[1] > 2.0:
        print(
            f"# load_warning: start load {load_start[0]:.2f}/{load_start[1]:.2f}"
            f" > 2.0 — refusing to write {fname}",
            file=sys.stderr,
        )
    else:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), fname),
            "w",
        ) as fh:
            fh.write(line + "\n")
    print(line)


def _young_batch_main(sf_dir: str, names: list[str]) -> None:
    """Child-process entry for the young pass: time the given queries in
    a brand-new JVM and print one JSON line {"wall": {name: sec},
    "cpu": {name: sec|null}}.  The first query runs once untimed so the
    batch pays JVM + Spark-internal JIT startup before any measurement
    (mirrors main()'s warmup)."""
    spark = get_spark(
        app_name="copperhead-bench-young",
        extra_conf={"spark.sql.codegen.fallback": "false"},
    )
    queries = all_queries()
    queries[names[0]].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall: dict[str, float] = {}
    cpu: dict[str, float | None] = {}
    for n in names:
        wall[n], cpu[n] = _time_query_cpu(spark, queries[n], sf_dir)
    spark.stop()
    print(json.dumps({"wall": wall, "cpu": cpu}))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--young-batch":
        _young_batch_main(sys.argv[2], sys.argv[3].split(","))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--soak100":
        _soak100_main()
    elif len(sys.argv) >= 2 and sys.argv[1] == "--pretrain10x":
        _pretrain10x_main()
    else:
        main()
