"""Streaming queries (capability extension; SURVEY.md §2.9, §7 step 8):
tumbling / sliding / session event-time windows + watermark dedup,
checked against batch SQL oracles — streaming semantics over a finite
replayed source must agree with the batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import scratch_dir
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register
from copperhead_spark.streaming.events import events_stream, run_to_memory


@register(
    "stream_tumbling_window",
    oracle=f"""
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start_us,
       event_type,
       COUNT(*) AS n,
       {exact_sum_sql("value", 4)} AS value_sum
FROM events
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window with watermark, replayed to
    completion — must equal the batch date_trunc aggregation."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), exact_sum(F.col("value"), 4).alias("value_sum"))
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.unix_micros("window.start").alias("win_start_us"),
        "event_type",
        "n",
        "value_sum",
    )


@register(
    "stream_sliding_window",
    oracle=f"""
SELECT win_start_us, COUNT(*) AS n, {exact_sum_sql("value", 4)} AS value_sum
FROM (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start_us, value
  FROM events
  UNION ALL
  SELECT CAST(epoch_us(date_trunc('hour', ts) - INTERVAL 1 HOUR) AS BIGINT) AS win_start_us,
         value
  FROM events
)
GROUP BY win_start_us
""",
    tags=("streaming",),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): every event lands in two
    windows; oracle = union of the two shifted hourly assignments."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"), exact_sum(F.col("value"), 4).alias("value_sum"))
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(F.unix_micros("window.start").alias("win_start_us"), "n", "value_sum")


@register(
    "stream_session_window",
    oracle="""
SELECT user_id, COUNT(*) AS n_sessions
FROM (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
  FROM events
)
WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
GROUP BY user_id
""",
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — session count must equal the
    batch lag-gap sessionization (t3_session_gaps).  Boundary semantics
    verified live (tests/test_advice_regressions.py): a gap of EXACTLY
    30 minutes merges into the same session, so the oracle gap predicate
    is strictly >."""
    ev = events_stream(spark, sf_dir)
    sessions = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
    )
    out = run_to_memory(sessions, mode="complete")
    return out.groupBy("user_id").agg(F.count("*").alias("n_sessions"))


@register(
    "stream_static_join",
    oracle=f"""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n,
       {exact_sum_sql("e.value", 4)} AS value_sum
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
    tags=("streaming",),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a broadcast
    static dimension (customer) row-by-row as micro-batches arrive — the
    streaming analogue of J5's broadcast scalar-map join.  The static
    side is re-planned per micro-batch (dimension updates are picked up),
    and the stateless join adds no streaming state; only the downstream
    aggregate keeps state."""
    from copperhead_spark.catalog import table

    ev = events_stream(spark, sf_dir)
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy("segment")
        .agg(F.count("*").alias("n"), exact_sum(F.col("value"), 4).alias("value_sum"))
    )
    return run_to_memory(agg, mode="complete")


@register(
    "stream_dedup_watermark",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
    tags=("streaming",),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates within watermark on (user_id, event_type) then
    count — on a fully-replayed finite stream this must equal batch
    COUNT(DISTINCT)."""
    ev = events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicates(["user_id", "event_type"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_users"))
    out = run_to_memory(agg, mode="complete")
    return out


def interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermarked click-attribution interval join plan, exposed so
    tests can drive it with progress capture (state-metric assertions)."""
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "6 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "6 hours")
    )
    return purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 6 HOURS"
        ),
    )


@register(
    "stream_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id AS user_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 6 HOUR
""",
    tags=("streaming",),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click-attribution shape): purchases
    join clicks by the same user within the preceding 6 hours.  Both
    sides carry a watermark and the join predicate bounds event-time
    distance, so Spark can size the join state and evict expired rows —
    the canonical unbounded-joins-need-time-bounds pattern (state-store
    eviction is metric-asserted in tests/test_streaming_stateful.py).
    Inner-join matches are emitted as they arrive (append mode); on a
    fully replayed finite stream the result must equal the batch
    interval self-join the oracle runs."""
    out = run_to_memory(interval_join_stream(spark, sf_dir), mode="append")
    return out.select("purchase_id", "click_id", "user_id")


@register(
    "stream_foreachbatch_sink",
    oracle=f"""
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start_us,
       COUNT(*) AS n,
       {exact_sum_sql("value", 4)} AS value_sum
FROM events
GROUP BY 1
""",
    tags=("streaming", "sources"),
)
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once STREAMING SINK pattern: update-mode windowed
    aggregate delivered through foreachBatch into a parquet table with
    dynamic partition overwrite keyed on the window — each micro-batch
    rewrites only the window partitions it touched, so replaying a batch
    (failure/retry) overwrites the same partitions with the same rows
    instead of duplicating them (idempotent upsert; the batch_id is
    recorded for audit).  Reading the sink back must equal the batch
    aggregation — that is the oracle.

    Scale: the sink write per micro-batch is proportional to the UPDATED
    windows only (update output mode + watermark bounds state); dynamic
    overwrite touches only those partitions of the sink table.
    """
    import os
    import shutil

    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), exact_sum(F.col("value"), 4).alias("value_sum"))
        .select(
            F.unix_micros("window.start").alias("win_start_us"), "n", "value_sum"
        )
    )
    # stable per-sf scratch path: reruns overwrite instead of leaking
    # a fresh mkdtemp tree per invocation
    sink = scratch_dir("fes", sf_dir)
    shutil.rmtree(sink, ignore_errors=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("win_start_us")
            .parquet(sink)
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(sink).select("win_start_us", "n", "value_sum")


# ---------------------------------------------------------------------------
# incremental HLL maintenance across micro-batches
# ---------------------------------------------------------------------------

def _hll_stream_oracle() -> str:
    from copperhead_spark.plans.sketches import _bucket_sql, _estimate_sql, _rank_sql

    return f"""
WITH cells AS (
  SELECT event_type,
         {_bucket_sql("user_id")} AS bucket,
         MAX({_rank_sql("user_id")}) AS r
  FROM events GROUP BY 1, 2
),
sk AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS v_present,
         SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) AS z
  FROM cells GROUP BY event_type
)
SELECT event_type, v_present, {_estimate_sql()} AS n_users_est
FROM sk
"""


@register(
    "stream_hll_incremental",
    oracle=_hll_stream_oracle(),
    tags=("streaming", "sketch"),
)
def stream_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch IN a stream: per micro-batch, the batch's
    (event_type, bucket, max-rank) HLL cells MAX-merge into a standing
    cell table via foreachBatch (read-merge-overwrite of a
    types x 4096 parquet — the sketch, not the keys, is the state), and
    the final per-type distinct-user estimate must equal the batch HLL
    rebuilt over ALL events — the mergeability property under arbitrary
    stream slicing, FULL-value-checked against the batch oracle.  The
    source replays as 4 file-splits with maxFilesPerTrigger=1, so the
    merge path genuinely executes 4 times.  At 100 TB the standing cell
    table stays types x m rows forever — streaming distinct-count state
    that never grows with cardinality, which is the entire reason to
    sketch."""
    import os
    import shutil

    from copperhead_spark.catalog import table
    from copperhead_spark.plans.sketches import _bucket_sql, _estimate_sql, _rank_sql

    root = scratch_dir("hllinc", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    src, cells_dir = f"{root}/src", f"{root}/cells"
    # 4-way split so availableNow + maxFilesPerTrigger=1 yields 4 real
    # micro-batches (one parquet file would collapse to a single merge)
    table(spark, sf_dir, "events").select("event_type", "user_id").repartition(
        4
    ).write.parquet(src)

    stream = spark.readStream.schema("event_type STRING, user_id BIGINT").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        b = (
            batch_df.selectExpr(
                "event_type",
                f"{_bucket_sql('user_id')} AS bucket",
                f"{_rank_sql('user_id')} AS rank",
            )
            .groupBy("event_type", "bucket")
            .agg(F.max("rank").alias("r"))
        )
        sess = batch_df.sparkSession
        if os.path.exists(cells_dir):
            b = (
                sess.read.parquet(cells_dir)
                .withColumnRenamed("r", "rank")
                .unionByName(b.withColumnRenamed("r", "rank"))
                .groupBy("event_type", "bucket")
                .agg(F.max("rank").alias("r"))
            )
        # write-then-swap: the standing table is also this batch's input
        tmp_out = cells_dir + ".next"
        b.write.mode("overwrite").parquet(tmp_out)
        shutil.rmtree(cells_dir, ignore_errors=True)
        os.rename(tmp_out, cells_dir)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    sk = (
        spark.read.parquet(cells_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("v_present"),
            F.sum(
                F.expr(
                    "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE)"
                )
            ).alias("z"),
        )
    )
    return sk.selectExpr("event_type", "v_present", f"{_estimate_sql()} AS n_users_est")


# ---------------------------------------------------------------------------
# CDC -> SCD2: incremental dimension maintenance under streaming delivery
# ---------------------------------------------------------------------------

_CDC_PIVOT = "1998-01-01"  # order dates span 1995..2001 at every SF


@register(
    "stream_cdc_scd2_apply",
    oracle="""
WITH changes AS (
  SELECT o_custkey, o_orderdate AS valid_from, o_orderstatus AS status,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
),
daily AS (SELECT o_custkey, valid_from, status FROM changes WHERE rn = 1),
dedup AS (
  SELECT * FROM (
    SELECT o_custkey, valid_from, status,
           LAG(status) OVER w AS prev_status
    FROM daily
    WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from)
  ) WHERE prev_status IS NULL OR status <> prev_status
)
SELECT o_custkey, status,
       CAST(valid_from AS DATE) AS valid_from,
       CAST(LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
            AS DATE) AS valid_to,
       CAST((LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
             IS NULL) AS BIGINT) AS is_current
FROM dedup
""",
    tags=("streaming", "SCD2", "warehouse"),
)
def stream_cdc_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance under REAL streaming delivery: the
    order-status change feed is split at {_CDC_PIVOT} into two
    generations, each ingested by its own availableNow file stream whose
    foreachBatch applies the CDC->SCD2 transition — close the standing
    current version when the status changes, extend it when the new
    events repeat it, append the new version chain.  The oracle is the
    BATCH SCD2 build over the whole feed (scd2_dimension_build's exact
    SQL): value equality proves incremental-apply == full-rebuild, the
    invariant that lets a 100 TB dimension be maintained by touching
    only changed keys per batch.

    Per batch, only the TOUCHED customers' current rows are re-derived
    (carry-in current row as a synthetic leading event + the batch's
    per-day deduped events, one window pass); closed history and
    untouched customers pass through untouched.  Requires per-key
    time-ordered delivery across batches (the standard CDC contract —
    out-of-order deltas need the raw change log, not the collapsed
    versions); each generation is one file, so availableNow preserves
    order.  The rebuilt table is localCheckpoint-materialized before the
    overwrite (never scans the files it replaces — io.py:40-52
    analogue)."""
    import os
    import shutil

    from copperhead_spark.catalog import table

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"
    )
    src1 = scratch_dir("cdc_g1", sf_dir)
    src2 = scratch_dir("cdc_g2", sf_dir)
    sink = scratch_dir("cdc_scd2_sink", sf_dir)
    for p in (src1, src2, sink):
        shutil.rmtree(p, ignore_errors=True)
    pivot = f"TIMESTAMP '{_CDC_PIVOT}'"
    orders.filter(F.expr(f"o_orderdate < {pivot}")).coalesce(1).write.parquet(src1)
    orders.filter(F.expr(f"o_orderdate >= {pivot}")).coalesce(1).write.parquet(src2)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        sess = batch_df.sparkSession
        wd = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
            F.col("o_orderkey").desc()
        )
        ev = (
            batch_df.select(
                "o_custkey",
                F.col("o_orderdate").alias("valid_from"),
                F.col("o_orderstatus").alias("status"),
                F.row_number().over(wd).alias("rn"),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        if os.path.exists(sink):
            cur = sess.read.parquet(sink)
            touched = ev.select("o_custkey").distinct()
            carry = (
                cur.filter(F.col("valid_to").isNull())
                .join(F.broadcast(touched), "o_custkey", "leftsemi")
                .select("o_custkey", "valid_from", "status")
            )
            keep = cur.join(
                F.broadcast(touched), "o_custkey", "leftsemi"
            ).filter(F.col("valid_to").isNotNull()).unionByName(
                cur.join(F.broadcast(touched), "o_custkey", "left_anti")
            )
            events = carry.unionByName(ev)
        else:
            keep = None
            events = ev
        w = Window.partitionBy("o_custkey").orderBy("valid_from")
        vers = (
            events.withColumn("prev_status", F.lag("status").over(w))
            .filter(
                F.col("prev_status").isNull()
                | (F.col("status") != F.col("prev_status"))
            )
            .select(
                "o_custkey",
                "status",
                "valid_from",
                F.lead("valid_from").over(w).alias("valid_to"),
            )
        )
        out = vers if keep is None else keep.unionByName(vers)
        # materialize BEFORE overwriting the table being read
        out.localCheckpoint().write.mode("overwrite").parquet(sink)

    for src in (src1, src2):
        q = (
            spark.readStream.schema(orders.schema)
            .parquet(src)
            .writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", src + "_ckpt")
            .start()
        )
        q.awaitTermination()

    return spark.read.parquet(sink).select(
        "o_custkey",
        "status",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        F.col("valid_to").isNull().cast("long").alias("is_current"),
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
