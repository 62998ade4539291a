"""SparkSession bootstrap.

The reference hand-configures a dask LocalCluster (40 workers x 1 thread,
12 GB each — /root/reference/run_stage1.py:182-188); here the equivalent
knobs are expressed once as Spark conf.  Everything is sized so the same
code runs on local[N] for tests and on a real cluster unchanged: AQE
handles partition coalescing / skew at runtime, shuffle partitions default
to ~2x cores locally (override via conf for a cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "copperhead-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults matter for correctness as well as speed:
      - session timezone pinned to UTC (oracle comparisons, timestamp math)
      - AQE on: runtime partition coalescing, skew-join splitting
      - Arrow on: pandas UDF / toPandas use Arrow batches
    """
    cpus = _cpus()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # dozens of whole-stage-codegen queries in one JVM press on the
        # default ~240 MB JIT code cache.  NOTE: raising it did NOT fix
        # the measured late-session pipeline slowdown (2.4s young vs
        # ~4.5s after 28 queries — bench.py times that plan in the young
        # session instead); the larger reservation is kept as cheap
        # prophylaxis for genuinely long sessions (plan-audit runs all
        # 180+ queries in one JVM), not as a fix for that regression.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", "/tmp/copperhead_spark_warehouse")
        # r12: Python workers import `sitecustomize` from this dir at
        # startup (workerenv/sitecustomize.py), which backports CPython
        # 3.12's stat-guarded zipimporter.invalidate_caches — pyspark's
        # per-task setup_spark_files calls importlib.invalidate_caches()
        # every task, and on 3.11 that re-parses pyspark.zip's whole
        # central directory each time (~0.25 CPU-s/task measured, the
        # dominant overhead of every mapInArrow/pandas-UDF stage).
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "workerenv"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
