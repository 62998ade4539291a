"""Source/sink queries (SURVEY.md §2.1 S3/S4/S9 ★): the partitioned
parquet sink is exercised end-to-end — write partitioned, read back
through partition discovery, aggregate — and checked against the oracle
reading the original table, proving the sink+scan round-trip lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register
from copperhead_spark.sources.parquet_io import read_partitioned, write_partitioned


@register(
    "s3_partitioned_sink_roundtrip",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n,
       {exact_sum_sql("o_totalprice")} AS total
FROM orders
GROUP BY 1, 2
""",
    tags=("S3", "S4", "S9"),
)
def s3_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned sink round-trip (io.py:25-37 one-dir-per-dataset ->
    partitionBy): write orders partitioned by priority with dynamic
    partition overwrite (S9 delete-before-write replacement), re-read via
    partition discovery, aggregate.  Oracle reads the ORIGINAL table, so
    any loss/dup in the sink or scan fails the value hash."""
    out_dir = os.path.join(
        tempfile.gettempdir(), "copperhead_spark_sink", os.path.basename(sf_dir.rstrip("/"))
    )
    orders = table(spark, sf_dir, "orders")
    write_partitioned(orders, out_dir, partition_by=("o_orderpriority",))
    back = read_partitioned(spark, out_dir)
    return back.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"),
        exact_sum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "s4_partition_pruned_scan",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n, {exact_sum_sql("o_totalprice")} AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderstatus
""",
    tags=("S4",),
)
def s4_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over a partitioned copy of orders: the
    priority predicate prunes directories before any file opens (the
    reference's per-dataset glob, run_stage2.py:148-153, for free).
    Always rewrites its own sink dir (orders is tiny) so the result never
    depends on stale /tmp state from an older fixture version."""
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "copperhead_spark_sink_s4",
        os.path.basename(sf_dir.rstrip("/")),
    )
    write_partitioned(
        table(spark, sf_dir, "orders"), out_dir, partition_by=("o_orderpriority",)
    )
    back = read_partitioned(spark, out_dir)
    return (
        back.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), exact_sum(F.col("o_totalprice")).alias("total"))
    )
