"""Table catalog over the testdata star schema.

Analogue of the reference's file-listing + load_dataframe layer
(/root/reference/python/io.py:55-107, stage1/preprocessor.py:55-69): the
reference enumerates files per dataset and concatenates per-file frames;
Spark's multi-path parquet reader plus Catalyst partition pruning replaces
all of it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan: Catalyst handles column
    pruning + predicate pushdown (the reference needed a manual branch
    whitelist for this — config/branches.py:115-134).

    Nanosecond parquet timestamps (events.ts) are illegal in Spark 4's
    reader; we read them as raw int64 nanos and convert to TIMESTAMP_NTZ
    (integer division — no double round-trip, so no precision loss)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
    return df


_SCRATCH_ROOT: str | None = None


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Per-process scratch sink path for queries that materialize an
    intermediate layout (partitioned/bucketed/CSV/ORC/JSONL copies).

    Stable WITHIN a process — keyed (kind, sf basename), so re-runs
    overwrite one tree instead of leaking a fresh mkdtemp per call — but
    namespaced by PID so two concurrent sessions on the same scale
    factor can never rmtree/overwrite each other's sink mid-query.  The
    whole per-process tree is removed at interpreter exit."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _SCRATCH_ROOT = os.path.join(
            tempfile.gettempdir(), f"copperhead_spark_pid{os.getpid()}"
        )
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return os.path.join(_SCRATCH_ROOT, kind, os.path.basename(sf_dir.rstrip("/")))


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so spark.sql() queries see the same table names
    the DuckDB oracle does."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
