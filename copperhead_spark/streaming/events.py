"""Structured Streaming over the events table.

The reference is strictly batch (SURVEY.md §2.9) — streaming is a
capability extension: tumbling/sliding/session windows with watermarks,
dedup-within-watermark.  Each helper runs the streaming query to
completion against the parquet-backed stream (trigger=availableNow +
memory sink: the deterministic "replay the table as a stream" harness)
and returns the result as a batch DataFrame, so the same oracle machinery
checks streaming semantics.

At scale the same plans run against a real source (Kafka/files) with
`writeStream` checkpoints; nothing in the plan changes — that is the
point of using event-time windows + watermarks rather than batch tricks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the same nanosecond-timestamp
    normalization as catalog.table (streaming readers need an explicit
    schema — no inference)."""
    from copperhead_spark.catalog import table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source wants a directory: point it at sf_dir with a glob
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        # watermarks require TIMESTAMP (not NTZ): timestamp_micros gives an
        # absolute-epoch instant, so windows/watermarks are tz-independent
        # (Spark windows are epoch-aligned, not calendar-aware)
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # parquet timestamp[us] without isAdjustedToUTC arrives as NTZ;
        # with the session timezone pinned to UTC the cast is wall-time
        # preserving, and watermarks get the TIMESTAMP they require
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_to_memory(
    stream_df: DataFrame,
    mode: str = "complete",
    state_partitions: int = 16,
    progress: list | None = None,
) -> DataFrame:
    """Drive a streaming aggregation to completion (availableNow) into a
    uniquely-named memory sink; return the materialized result.

    Streaming state-store partitioning is pinned by the shuffle-partition
    count at query start; a vanilla session's default 200 means 200
    state tasks per stateful operator — measured 29 s for a toy dedup.
    Temporarily lower it for the replay harness (restored after).

    Pass a list as ``progress`` to receive the query's per-micro-batch
    StreamingQueryProgress dicts — tests assert state-store metrics
    (stateOperators[*].numRowsTotal) against their event-time bounds."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if progress is not None:
            progress.extend(p for p in q.recentProgress if p is not None)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
