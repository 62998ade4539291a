"""Ingestion layout optimization (S4/S5 scale path; beyond-reference).

The reference controls parallelism by chunking ROOT files at read time
(100k events/task, /root/reference/run_stage1.py:54-58) and by
repartitioning the loaded dataframe to ~2x ncpus
(/root/reference/python/io.py:76-90).  On Spark the analogous lever is
the *on-disk layout*: scan parallelism is bounded by file count x
row-group count, and a table written as one file with one row group
(as the driver's testdata is) serializes every downstream scan no
matter how many executors exist.  Re-layouting once at ingest fixes
every subsequent query; repartition()-after-scan fixes only the stages
after the (still serial) scan and pays an extra shuffle each run.

At 100 TB the knobs are:
- ``target_file_bytes`` ~128 MB: small enough that a 1000-executor
  cluster gets even splits, large enough to amortize footer/open costs
  (the classic small-files problem).
- ``cluster_by``: range-partition + sort by a predicate column so each
  file covers a narrow key range; parquet min/max stats then prune
  whole files for selective scans (zone-map pruning for free).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _input_bytes(path: str) -> int:
    """Total bytes under ``path`` (single file or directory tree)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def plan_file_count(
    input_bytes: int, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    return max(1, math.ceil(input_bytes / max(1, target_file_bytes)))


def optimize_layout(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: tuple[str, ...] = (),
    min_files: int = 1,
) -> dict:
    """Rewrite parquet at ``src`` into a scan-parallel layout at ``dst``.

    Without ``cluster_by``: round-robin into N files sized to
    ``target_file_bytes`` (fixes single-file / small-files ingest).
    With ``cluster_by``: range-partition on the key(s) and sort within
    each file, so file-level min/max stats make selective scans skip
    files entirely.  Returns ``{"n_files", "input_bytes", "clustered"}``.
    """
    n_files = max(min_files, plan_file_count(_input_bytes(src), target_file_bytes))
    df: DataFrame = spark.read.parquet(src)
    if cluster_by:
        df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    return {
        "n_files": n_files,
        "input_bytes": _input_bytes(src),
        "clustered": bool(cluster_by),
    }


def list_data_files(path: str) -> list[str]:
    """Enumerate the data files of a parquet table directory (S5 file
    listing, /root/reference/stage1/preprocessor.py:55-69 glob
    equivalent).  Spark accepts the resulting explicit path list in
    ``spark.read.parquet(*paths)`` — the harness uses this to prove a
    multi-path scan equals the directory scan."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)
