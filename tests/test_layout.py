"""Layout-optimization ingest (sources/layout.py): file-count sizing,
losslessness, date-clustered file-level min/max stats, and multi-path
scan equivalence (S5)."""

import os

import pyarrow.parquet as pq

from copperhead_spark.sources.layout import (
    list_data_files,
    optimize_layout,
    plan_file_count,
)


def test_plan_file_count_sizing():
    mb = 1024 * 1024
    assert plan_file_count(0, 128 * mb) == 1
    assert plan_file_count(128 * mb, 128 * mb) == 1
    assert plan_file_count(128 * mb + 1, 128 * mb) == 2
    assert plan_file_count(100 * 1024 * 1024 * mb, 128 * mb) == 819_200


def test_optimize_layout_roundtrip_and_clustering(spark, sf_dir, tmp_path):
    src = os.path.join(sf_dir, "orders.parquet")
    dst = str(tmp_path / "orders_opt")
    stats = optimize_layout(
        spark,
        src,
        dst,
        target_file_bytes=64 * 1024,
        cluster_by=("o_orderdate",),
        min_files=4,
    )
    files = list_data_files(dst)
    assert len(files) == stats["n_files"] >= 4

    # lossless: same row count and orderkey checksum as the source
    a = spark.read.parquet(src).selectExpr(
        "count(*) AS n", "sum(o_orderkey) AS s"
    ).first()
    b = spark.read.parquet(*files).selectExpr(
        "count(*) AS n", "sum(o_orderkey) AS s"
    ).first()
    assert (a.n, a.s) == (b.n, b.s)

    # clustered: per-file o_orderdate [min,max] ranges must not all
    # overlap — ranges from range-partitioning are disjoint, so each
    # file's min should be >= the previous file's max when ordered.
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_orderdate")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
