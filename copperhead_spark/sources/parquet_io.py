"""Partitioned parquet scan/sink (SURVEY.md §2.1 S3/S4/S9 ★).

Reference behavior being replaced:
- S3: one directory per dataset, one file per task
  (/root/reference/python/io.py:25-37) -> `partitionBy("dataset")`.
- S4: read file list + concat + repartition to ~2x ncpus
  (io.py:55-107) -> multi-path `spark.read.parquet` + AQE coalescing.
- S9: delete-before-write of stale outputs (io.py:40-52,134-154) ->
  dynamic partition overwrite (only partitions present in the new data
  are replaced — safer than the reference's rm-rf-then-write).

At 100 TB: partition columns should be low-cardinality (dataset, year);
file sizing is governed by the upstream shuffle — repartition(n, keys)
before the sink to control files-per-partition-dir (the `max_files`
knob below)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("dataset",),
    mode: str = "overwrite",
    dynamic: bool = True,
    max_files_per_partition: int | None = None,
) -> None:
    """Partitioned parquet sink with dynamic partition overwrite."""
    spark = df.sparkSession
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if max_files_per_partition:
        df = df.repartition(max_files_per_partition, *partition_by)
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Hive-style partition discovery: predicates on partition columns
    prune directories before any file is opened."""
    return spark.read.parquet(path)
