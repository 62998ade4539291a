"""Histogram + time-bucket aggregates (SURVEY.md §2.4 A5/A13 ★) and the
date/time capability extension (§2.8: absent in the reference — its time
axis is run/lumi/event integers — but exercised by the driver's events
table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.operators.histogram import bin_index_sql, histogram
from copperhead_spark.plans.registry import register

_HIST_LO, _HIST_HI, _HIST_N = 0.0, 110000.0, 55


@register(
    "a5_weighted_histogram",
    oracle=f"""
SELECT l_returnflag AS region,
       {bin_index_sql("l_extendedprice", _HIST_LO, _HIST_HI, _HIST_N)} AS bin_idx,
       {exact_sum_sql("1 - l_discount", 4)} AS value,
       {exact_sum_sql("(1 - l_discount) * (1 - l_discount)", 8)} AS sumw2
FROM lineitem
GROUP BY 1, 2
""",
    tags=("A5", "A6"),
)
def a5_weighted_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core stage-2 aggregate (histogrammer.py:28-120): weighted
    histogram of a kinematic variable per category, sum(w) + sum(w^2) per
    bin.  One groupBy replaces the reference's region x wgt x syst x
    channel Python loops."""
    li = table(spark, sf_dir, "lineitem")
    return histogram(
        li,
        value=F.col("l_extendedprice"),
        lo=_HIST_LO,
        hi=_HIST_HI,
        nbins=_HIST_N,
        by=[F.col("l_returnflag").alias("region")],
        weight=1 - F.col("l_discount"),
    )


@register(
    "a13_value_counts",
    oracle="""
SELECT CAST(FLOOR(value / 50) AS BIGINT) AS value_bin, COUNT(*) AS n
FROM events
GROUP BY 1
""",
    tags=("A13",),
)
def a13_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw value-counts histogram (auto-PU profile rebuild,
    pu_reweight.py:18-26): groupBy floor(x/width) + count; the result is
    broadcast back in the two-pass normalization pattern."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50).cast("long").alias("value_bin")
    ).agg(F.count("*").alias("n"))


@register(
    "t1_time_bucket_agg",
    oracle=f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       event_type,
       COUNT(*) AS n,
       {exact_sum_sql("value", 4)} AS value_sum
FROM events
GROUP BY 1, 2
""",
    tags=("T1", "date"),
)
def t1_time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-bucket aggregate (date_trunc): the batch analogue of
    a streaming window; capability extension beyond the reference
    (SURVEY.md §2.9)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        exact_sum(F.col("value"), 4).alias("value_sum"),
    )


@register(
    "t2_date_parts",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       COUNT(*) AS n_orders,
       {exact_sum_sql("o_totalprice")} AS month_total
FROM orders
GROUP BY 1, 2
""",
    tags=("T2", "date"),
)
def t2_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-part extraction + rollup-by-month (date function family:
    year/month/extract)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(
        F.count("*").alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("month_total"),
    )


@register(
    "t3_session_gaps",
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
    tags=("T3", "W4", "date"),
)
def t3_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag(ts) per user + gap > 30 min starts a new
    session; count sessions per user.  The batch twin of streaming
    session_window; an exactly-30-minute gap MERGES in both forms
    (boundary pinned live in tests/test_advice_regressions.py)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTE"))
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )


@register(
    "asof_cogroup_merge",
    oracle="""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
)
SELECT p.purchase_id, p.user_id, p.ts, c.click_id, c.click_ts
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
""",
    tags=("J8", "asof", "date"),
)
def asof_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via cogrouped applyInPandas: purchases and clicks
    cogroup on user_id, and each group pair runs pd.merge_asof
    (direction='backward', inclusive) in one Arrow batch.  This is the
    second as-of strategy next to operators/asof.py's union+running-max
    (asof_last_purchase): cogroup shuffles BOTH sides once on the key and
    the per-key merge is O(n log n) local — the right choice when per-key
    group sizes are modest and the pandas ecosystem (merge_asof
    tolerances, nearest-direction) is wanted.  Clicks are pre-deduped per
    (user, ts) keeping max event_id so the match is unique and engine-
    independent.  The oracle is DuckDB's native ASOF LEFT JOIN."""
    import pandas as pd

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["purchase_id", "user_id", "ts", "click_id", "click_ts"]
            )
        out = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("click_ts")[["click_ts", "click_id"]],
            left_on="ts",
            right_on="click_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        out["click_id"] = out["click_id"].astype("Int64")
        return out[["purchase_id", "user_id", "ts", "click_id", "click_ts"]]

    return purchases.groupBy("user_id").cogroup(clicks.groupBy("user_id")).applyInPandas(
        merge,
        "purchase_id long, user_id long, ts timestamp_ntz, "
        "click_id long, click_ts timestamp_ntz",
    )


@register(
    "t4_lag_lead_delta",
    oracle="""
SELECT user_id, event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       value - LAG(value) OVER w AS delta_value,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    tags=("T4", "W5", "date"),
)
def t4_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag/lead deltas: time since the previous event, value
    change vs the previous event, and the NEXT event's type — the
    standalone offset-window operator (sessionize uses lag internally;
    this exposes lag AND lead as first-class outputs).  The double
    subtraction is a single IEEE op on values both engines read from the
    same parquet, so it is bit-deterministic with no fixed-point detour.
    Scale: one hash shuffle on user_id, in-partition sort — the same
    exchange any per-user window shares; ties broken by event_id so the
    frame order is total."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # session TZ is pinned UTC (session.py), so NTZ -> TIMESTAMP is lossless
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


_GF_HOUR_US = 3_600_000_000


@register(
    "t5_gap_fill_ffill",
    oracle=f"""
WITH hourly AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM hourly),
grid AS (
  SELECT unnest(range(lo, hi + {_GF_HOUR_US}, {_GF_HOUR_US})) AS hour_us
  FROM bounds
),
j AS (
  SELECT g.hour_us, h.n, (h.n IS NULL) AS is_gap
  FROM grid g LEFT JOIN hourly h ON g.hour_us = h.hour_us
)
SELECT hour_us,
       CAST(is_gap AS BIGINT) AS is_gap,
       CAST(LAST_VALUE(n IGNORE NULLS) OVER (
         ORDER BY hour_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_filled
FROM j
""",
    tags=("T5", "date", "gapfill"),
)
def t5_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify the hourly rollup onto a complete
    hour grid (sequence + explode between observed min and max), mark
    synthesized rows, and forward-fill counts with last(..., ignorenulls)
    — the hypertable/gap-fill operator every monitoring rollup needs
    before rate math (a missing hour must read as 'carry last', not
    'drop row').  The grid generation is one 2-column bounds row
    exploded map-side; the fill is one ordered window over the
    hours-sized table, so cost is bound by the TIME RANGE, not the event
    volume (events collapse in the first groupBy).  At 100 TB,
    partition the window by series id — same plan, keyed."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
            "hour_us"
        )
    ).agg(F.count("*").alias("n"))
    grid = hourly.agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi")).selectExpr(
        f"explode(sequence(lo, hi, {_GF_HOUR_US})) AS hour_us"
    )
    j = grid.join(hourly, "hour_us", "left")
    w = Window.orderBy("hour_us").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "hour_us",
        F.col("n").isNull().cast("long").alias("is_gap"),
        F.last("n", ignorenulls=True).over(w).cast("long").alias("n_filled"),
    )


@register(
    "t16_gap_fill_keyed",
    oracle=f"""
WITH hourly AS (
  SELECT user_id,
         CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM hourly GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(range(lo, hi + {_GF_HOUR_US}, {_GF_HOUR_US})) AS hour_us
  FROM bounds
),
filled AS (
  SELECT g.user_id, g.hour_us, (h.n IS NULL) AS is_gap,
         LAST_VALUE(h.n IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS n_filled
  FROM grid g LEFT JOIN hourly h
    ON g.user_id = h.user_id AND g.hour_us = h.hour_us
)
SELECT user_id,
       COUNT(*) AS n_hours,
       CAST(SUM(CASE WHEN is_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(SUM(n_filled) AS BIGINT) AS filled_sum,
       CAST(SUM(CASE WHEN is_gap THEN n_filled ELSE 0 END) AS BIGINT)
         AS gap_filled_sum
FROM filled GROUP BY user_id
""",
    tags=("T5", "date", "gapfill"),
)
def t16_gap_fill_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of t5_gap_fill_ffill, retiring its docstring
    caveat ("at 100 TB, partition the window by series id"): the hour
    grid is built PER SERIES (user_id) between each user's own first and
    last hour, the left join runs on the composite (user_id, hour_us)
    key, and the forward-fill window is PARTITIONED BY user_id — no
    global ordering anywhere, so the plan scales with series count
    exactly like any per-user window (one hash exchange on user_id).
    The per-user grid bounds come from a groupBy, not a driver collect.
    Output is the per-series fill audit (grid size, gap count, exact
    BIGINT fill-mass totals with the gap-only component separated), so
    a single wrong carry anywhere flips the full-value hash while the
    result stays |users|-sized at any SF."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id",
        F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
            "hour_us"
        ),
    ).agg(F.count("*").alias("n"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
        .selectExpr(
            "user_id", f"explode(sequence(lo, hi, {_GF_HOUR_US})) AS hour_us"
        )
    )
    j = grid.join(hourly, ["user_id", "hour_us"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = j.select(
        "user_id",
        F.col("n").isNull().alias("is_gap"),
        F.last("n", ignorenulls=True).over(w).alias("n_filled"),
    )
    return filled.groupBy("user_id").agg(
        F.count("*").alias("n_hours"),
        F.sum(F.col("is_gap").cast("long")).cast("long").alias("n_gaps"),
        F.sum("n_filled").cast("long").alias("filled_sum"),
        F.sum(F.when(F.col("is_gap"), F.col("n_filled")).otherwise(0))
        .cast("long")
        .alias("gap_filled_sum"),
    )


@register(
    "a17_histogram_2d",
    oracle=f"""
SELECT CAST(FLOOR(value / 100) AS BIGINT) AS value_bin,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_bin,
       COUNT(*) AS n,
       {exact_sum_sql("value", 4)} AS value_sum
FROM events
GROUP BY 1, 2
""",
    tags=("A17", "A5", "histogram"),
)
def a17_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D (weighted) histogram: joint (value-bin x hour-of-day) counts
    and mass — the heatmap rollup behind occupancy plots and 2-D
    template fits (the 1-D weighted form is a5_weighted_histogram; the
    2-D LOOKUP inverse is j7).  Still exactly ONE groupBy: dimensionality
    multiplies the key space (bins_x * bins_y cells), not the passes, and
    map-side partial agg keeps the exchange bounded by cells, not rows —
    the same contract as every histogram here."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 100).cast("long").alias("value_bin"),
        F.hour(F.col("ts")).cast("long").alias("hour_bin"),
    ).agg(
        F.count("*").alias("n"),
        exact_sum(F.col("value"), 4).alias("value_sum"),
    )


@register(
    "t7_ohlc_downsample",
    oracle=f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       event_type,
       COUNT(*) AS n,
       (MIN({{'t': ts, 'i': event_id, 'v': value}})).v AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       (MAX({{'t': ts, 'i': event_id, 'v': value}})).v AS close
FROM events
GROUP BY 1, 2
""",
    tags=("T7", "date"),
)
def t7_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling: per (hour, event_type), the value at the
    earliest timestamp (open), extremes (high/low), and the value at
    the latest timestamp (close) — the canonical time-series
    re-sampling shape.  Open/close are picked by a lexicographic
    MIN/MAX over (ts, event_id, value) structs on BOTH engines (never
    min_by/arg_min, whose tie behavior is engine-arbitrary; event_id
    makes the key unique, so the value slot never decides).  Selection,
    not arithmetic, so the doubles hash bit-exactly.  One partial-agg
    shuffle keyed (hour, type) — the same one-exchange shape as
    t1_time_bucket_agg regardless of input size."""
    ev = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("i"), F.col("value").alias("v"))
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.min(key)["v"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(key)["v"].alias("close"),
    )


# ---------------------------------------------------------------------------
# gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------

_STREAK_EPOCH = "1992-01-01"

_STREAK_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '{_STREAK_EPOCH}', CAST(ts AS DATE)) AS dayn
  FROM events
),
isl AS (
  SELECT user_id, dayn,
         dayn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dayn) AS island
  FROM d
),
runs AS (
  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(run_len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
"""


@register("t8_streaks_islands", oracle=_STREAK_ORACLE, tags=("timeseries", "window"))
def t8_streaks_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of CONSECUTIVE active
    days plus island count and total active days.  The classic
    row_number trick — day_number minus the per-user rank of that day is
    constant within a consecutive run — turns streak detection into two
    grouped aggregations, no self-join, no iteration.

    Scale design: one shuffle partitions (user, day) rows by user for
    the rank window; the island aggregation reuses that partitioning
    (user is a prefix of the groupBy key) and the final per-user rollup
    likewise — Catalyst collapses all three into a single Exchange on
    user_id.  Day numbers are exact integers (datediff from a fixed
    epoch), so island keys are engine-portable.

    Reference analogue: none (sessionization-family extension; the
    reference's nearest shape is the run/lumi interval mask,
    /root/reference/python/corrections.py lumi filtering)."""
    from pyspark.sql import Window

    d = (
        table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            f"datediff(CAST(ts AS DATE), DATE '{_STREAK_EPOCH}') AS dayn",
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dayn")
    runs = (
        d.withColumn("island", F.col("dayn") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").cast("long").alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("run_len").cast("long").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing: power-of-two weights, bounded lookback
# ---------------------------------------------------------------------------

# weights 1/2, 1/4, ..., 1/128, 1/128 sum to exactly 1.0 and every term
# v * 2^-k is an EXACT IEEE-754 operation, so the smoothed value is
# bit-deterministic without any transcendental in the hot path
_EWMA_TERMS_SQL = (
    "(v0 / 2 + v1 / 4 + v2 / 8 + v3 / 16 + v4 / 32 + v5 / 64"
    " + v6 / 128 + v7 / 128)"
)


def _ewma_lags_sql(src: str) -> str:
    lags = ",\n       ".join(
        f"COALESCE(LAG(value, {i}) OVER w, CAST(0 AS DOUBLE)) AS v{i}"
        for i in range(1, 8)
    )
    return f"""
SELECT user_id, event_id, value AS v0,
       {lags}
FROM {src}
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


@register(
    "t9_ewma_smoothing",
    oracle=f"""
WITH lagged AS ({_ewma_lags_sql("events")})
SELECT user_id, event_id,
       CAST(ROUND({_EWMA_TERMS_SQL} * 1e9) AS BIGINT) AS ewma_e9
FROM lagged
""",
    tags=("timeseries", "window"),
)
def t9_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user with a bounded
    8-observation lookback and power-of-two weights (1/2, 1/4, ...,
    1/128, 1/128 — summing to exactly 1).  Dividing a double by a power
    of two is exact in IEEE-754 and both engines evaluate the identical
    left-associated sum, so the result is bit-deterministic; the final
    1e-9 fixed-point cast is belt-and-braces, not a tolerance.

    Scale design: the bounded frame means ONE user-partitioned exchange
    + in-partition sort (shared with every other per-user window) and
    O(1) state per row — unlike an unbounded recursive EWMA, which
    serializes within each key.  Bounded lookback is how streaming
    smoothers ship at 100 TB; the truncation error is 2^-7 of mass.

    Reference analogue: none (monitoring-rollup extension; nearest
    reference shape is the rolling window math in its timeseries
    helpers)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    lag_cols = [F.col("value").alias("v0")] + [
        F.coalesce(F.lag("value", i).over(w), F.lit(0.0).cast("double")).alias(f"v{i}")
        for i in range(1, 8)
    ]
    return (
        ev.select("user_id", "event_id", *lag_cols)
        .selectExpr(
            "user_id",
            "event_id",
            f"CAST(ROUND({_EWMA_TERMS_SQL} * 1e9) AS BIGINT) AS ewma_e9",
        )
    )


# ---------------------------------------------------------------------------
# running-peak drawdown profile
# ---------------------------------------------------------------------------


@register(
    "t10_max_drawdown",
    oracle="""
WITH runs AS (
  SELECT user_id, value,
         MAX(value) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS runmax
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(ROUND(MAX(runmax - value) * 1e6) AS BIGINT) AS max_drawdown_e6,
       CAST(ROUND(MAX(value) * 1e6) AS BIGINT) AS peak_e6
FROM runs GROUP BY user_id
""",
    tags=("timeseries", "window"),
)
def t10_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: the largest drop from a running peak
    over the time-ordered value series — the risk metric every
    financial/monitoring rollup computes.  runmax - value is a single
    IEEE subtraction of engine-identical doubles and MAX is
    order-independent, so only the final report rounds (1e-6 fixed
    point).

    Scale: one user-partitioned exchange shared by the running-max
    window and the per-user rollup (partition keys align, Catalyst
    plans one Exchange); state per row is O(1).

    Reference analogue: the running cumulative window family (W4,
    SURVEY §2) applied to a peak-tracking frame."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = ev.select(
        "user_id", "value", F.max("value").over(w).alias("runmax")
    )
    return runs.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.max(F.col("runmax") - F.col("value")) * 1e6)
        .cast("long")
        .alias("max_drawdown_e6"),
        F.round(F.max("value") * 1e6).cast("long").alias("peak_e6"),
    )


# ---------------------------------------------------------------------------
# autocorrelation function over zero-filled daily series
# ---------------------------------------------------------------------------

_ACF_MAXLAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS typ,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT typ, MIN(d) AS dlo, MAX(d) AS dhi FROM daily GROUP BY 1),
spine AS (SELECT typ, unnest(range(dlo, dhi + 1)) AS d FROM span),
s AS (
  SELECT spine.typ, spine.d, COALESCE(daily.c, 0) AS c
  FROM spine LEFT JOIN daily ON spine.typ = daily.typ AND spine.d = daily.d
),
led AS (
  SELECT typ, c AS x,
         {", ".join(f"LEAD(c, {L}) OVER w AS y{L}" for L in range(1, _ACF_MAXLAG + 1))}
  FROM s WINDOW w AS (PARTITION BY typ ORDER BY d)
),
pairs AS (
  {" UNION ALL ".join(
    f"SELECT typ, CAST({L} AS BIGINT) AS lag, x, y{L} AS y FROM led"
    f" WHERE y{L} IS NOT NULL"
    for L in range(1, _ACF_MAXLAG + 1)
  )}
),
mom AS (
  SELECT typ, lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT typ, lag, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS acf
FROM mom ORDER BY typ, lag
"""


@register("t11_acf_lags", oracle=_ACF_ORACLE, tags=("T1", "date", "statistics"))
def t11_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of per-type daily event counts at lags
    1..{_ACF_MAXLAG}: the seasonality probe (a weekly cycle shows as a
    lag-7 peak) run as lagged Pearson correlation over the ZERO-FILLED
    daily series — missing days are real zeros, not skipped rows, or
    every gap would silently splice non-adjacent days together.

    Exactness: the a14 discipline — all moment sums (n, Σx, Σy, Σxy,
    Σx², Σy²) are exact BIGINT; the one float combine per (type, lag)
    row runs identical IEEE ops on identical integers on both engines.

    Scale design: the raw log collapses to |types| x |days| cells in one
    partial-agg shuffle; the spine fan-out, the single window pass that
    produces ALL {_ACF_MAXLAG} leads at once (one sort, not one per
    lag), the stack unpivot, and the moment rollup all run on those
    cells.  ACF over a 100 TB log is therefore calendar-sized.

    Reference analogue: extends the t-series family (t1 buckets, t9
    EWMA) with the diagnostics every forecasting pipeline runs first."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr(
            "event_type AS typ",
            "datediff(CAST(ts AS DATE), DATE '1970-01-01') AS d",
        )
        .groupBy("typ", "d")
        .agg(F.count("*").cast("long").alias("c"))
    )
    span = daily.groupBy("typ").agg(F.min("d").alias("dlo"), F.max("d").alias("dhi"))
    spine = span.selectExpr("typ", "explode(sequence(dlo, dhi)) AS d")
    s = (
        spine.join(daily, ["typ", "d"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
    )
    w = Window.partitionBy("typ").orderBy("d")
    led = s.select(
        "typ",
        F.col("c").alias("x"),
        *[F.lead("c", L).over(w).alias(f"y{L}") for L in range(1, _ACF_MAXLAG + 1)],
    )
    stack_args = ", ".join(
        f"CAST({L} AS BIGINT), y{L}" for L in range(1, _ACF_MAXLAG + 1)
    )
    pairs = led.selectExpr(
        "typ", "x", f"stack({_ACF_MAXLAG}, {stack_args}) AS (lag, y)"
    ).filter(F.col("y").isNotNull())
    mom = pairs.groupBy("typ", "lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return mom.select("typ", "lag", "n", (num / den).alias("acf")).orderBy(
        "typ", "lag"
    )


# ---------------------------------------------------------------------------
# max-concurrency interval sweep (two-level / segmented prefix sum)
# ---------------------------------------------------------------------------

_CONC_DUR_US = 3600 * 1_000_000  # each event holds a slot for 1 h


_CONC_ORACLE = f"""
WITH pts AS (
  SELECT event_type AS typ, epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {_CONC_DUR_US}, -1 FROM events
),
inst AS (
  SELECT typ, t, CAST(SUM(d) AS BIGINT) AS delta
  FROM pts GROUP BY typ, t
),
run AS (
  SELECT typ, t, t // 86400000000 AS day,
         CAST(SUM(delta) OVER (PARTITION BY typ ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM inst
)
SELECT typ, CAST(day AS BIGINT) AS day, CAST(MAX(conc) AS BIGINT) AS day_peak
FROM run GROUP BY typ, day ORDER BY typ, day
"""


@register("t12_concurrency_sweep", oracle=_CONC_ORACLE, tags=("T1", "intervals"))
def t12_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per (event type, day): every event holds a slot
    for one hour; the sweep turns intervals into +1/-1 points and takes
    the running sum's per-day maximum — capacity planning's canonical
    query.  Collapsing simultaneous points first (SUM of deltas per
    instant) makes the prefix sum deterministic under ties on both
    engines; intervals crossing midnight are handled for free because
    the -1 point simply lands on the next day.

    Scale design: the oracle's single global-ordered running sum cannot
    scale, so the Spark plan is the TWO-LEVEL (segmented) prefix sum:
    within each (type, day) segment an ordered window computes the local
    running max and the segment's total drift; a second, day-level
    window (|types| x |days| rows — calendar-sized) accumulates segment
    totals into each day's entering base; day_peak = base + local max.
    That is the classic distributed-scan decomposition: the only
    full-data exchange is the per-instant collapse, and no window ever
    sorts more than one segment.

    Reference analogue: P4's interval-membership (lumi mask) checks
    points against fixed intervals; this aggregates the intervals
    themselves."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(
        F.col("event_type").alias("typ"), us.alias("t"), F.lit(1).alias("d")
    ).unionByName(
        ev.select(
            F.col("event_type").alias("typ"),
            (us + F.lit(_CONC_DUR_US)).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    inst = (
        pts.groupBy("typ", "t")
        .agg(F.sum("d").cast("long").alias("delta"))
        .withColumn("day", F.expr("t DIV 86400000000"))
    )
    w_in = (
        Window.partitionBy("typ", "day")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = inst.select(
        "typ",
        "day",
        F.sum("delta").over(w_in).alias("local_run"),
    )
    day = seg.groupBy("typ", "day").agg(
        F.max("local_run").cast("long").alias("local_peak")
    )
    # segment totals: the drift a day contributes to every later day
    totals = (
        inst.groupBy("typ", "day").agg(F.sum("delta").cast("long").alias("drift"))
    )
    w_days = (
        Window.partitionBy("typ")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = totals.select(
        "typ",
        "day",
        F.coalesce(F.sum("drift").over(w_days), F.lit(0)).cast("long").alias("base"),
    )
    return (
        day.join(base, ["typ", "day"])
        .selectExpr("typ", "day", "CAST(base + local_peak AS BIGINT) AS day_peak")
        .orderBy("typ", "day")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection on zero-filled daily series
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type AS typ,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT typ, MIN(d) AS dlo, MAX(d) AS dhi FROM daily GROUP BY 1),
spine AS (SELECT typ, unnest(range(dlo, dhi + 1)) AS d FROM span),
s AS (
  SELECT spine.typ, spine.d, COALESCE(daily.c, 0) AS c
  FROM spine LEFT JOIN daily ON spine.typ = daily.typ AND spine.d = daily.d
),
m AS (
  SELECT typ, CAST(SUM(c) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS nd
  FROM s GROUP BY typ
),
dev AS (
  SELECT s.typ, s.d,
         CAST(s.c * 1000000 - (m.total * 1000000) // m.nd AS BIGINT) AS dev_e6,
         m.nd
  FROM s JOIN m ON s.typ = m.typ
),
run0 AS (
  SELECT typ, d, nd, CAST(SUM(dev_e6) OVER w AS BIGINT) AS sp
  FROM dev
  WINDOW w AS (PARTITION BY typ ORDER BY d ROWS UNBOUNDED PRECEDING)
),
run AS (
  SELECT typ, d, nd, sp,
         CAST(LEAST(0, MIN(sp) OVER w2) AS BIGINT) AS runmin
  FROM run0
  WINDOW w2 AS (PARTITION BY typ ORDER BY d ROWS UNBOUNDED PRECEDING)
),
cu AS (SELECT typ, d, nd, sp - runmin AS cusum FROM run)
SELECT typ, CAST(MIN(nd) AS BIGINT) AS n_days,
       CAST(MAX(cusum) AS BIGINT) AS peak_cusum_e6,
       CAST(MIN(CASE WHEN cusum = mx THEN d END) AS BIGINT) AS changepoint_day
FROM (SELECT *, MAX(cusum) OVER (PARTITION BY typ) AS mx FROM cu)
GROUP BY typ ORDER BY typ
"""


@register("t13_cusum_changepoint", oracle=_CUSUM_ORACLE, tags=("T1", "statistics"))
def t13_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: deviations from the
    series mean accumulate, and the one-sided CUSUM statistic is the
    identity S_t - min(0, min_{s<=t} S_s) — a pure window algebra
    rewrite of the textbook recursive max(0, C_{t-1} + dev) that SQL
    windows cannot express directly.  The peak and its (earliest) day
    are the changepoint report.  All arithmetic is exact: counts are
    integers, the mean enters as a 1e-6 fixed-point floor, deviations
    and prefix sums stay BIGINT.

    Scale design: identical envelope to t11_acf_lags — the raw log
    collapses to calendar-sized daily cells in one shuffle; the prefix
    sum, running min, and argmax windows all run per type over days.
    The recursive-definition-to-prefix-identity rewrite is the point:
    it turns an inherently sequential statistic into two scans.

    Reference analogue: events_spike_detection thresholds single days;
    CUSUM finds sustained level shifts (the drift a spike test
    misses)."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr(
            "event_type AS typ",
            "datediff(CAST(ts AS DATE), DATE '1970-01-01') AS d",
        )
        .groupBy("typ", "d")
        .agg(F.count("*").cast("long").alias("c"))
    )
    span = daily.groupBy("typ").agg(F.min("d").alias("dlo"), F.max("d").alias("dhi"))
    s = (
        span.selectExpr("typ", "explode(sequence(dlo, dhi)) AS d")
        .join(daily, ["typ", "d"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
    )
    m = s.groupBy("typ").agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("nd"),
    )
    dev = s.join(F.broadcast(m), "typ").selectExpr(
        "typ",
        "d",
        "nd",
        "CAST(c * 1000000 - (total * 1000000) DIV nd AS BIGINT) AS dev_e6",
    )
    w = (
        Window.partitionBy("typ")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = dev.select(
        "typ",
        "d",
        "nd",
        F.sum("dev_e6").over(w).cast("long").alias("sp"),
    ).select(
        "typ",
        "d",
        "nd",
        "sp",
        F.least(F.lit(0).cast("long"), F.min("sp").over(w)).alias("runmin"),
    )
    cu = run.selectExpr("typ", "d", "nd", "CAST(sp - runmin AS BIGINT) AS cusum")
    mx = cu.withColumn("mx", F.max("cusum").over(Window.partitionBy("typ")))
    return (
        mx.groupBy("typ")
        .agg(
            F.min("nd").cast("long").alias("n_days"),
            F.max("cusum").cast("long").alias("peak_cusum_e6"),
            F.min(F.when(F.col("cusum") == F.col("mx"), F.col("d")))
            .cast("long")
            .alias("changepoint_day"),
        )
        .orderBy("typ")
    )


# ---------------------------------------------------------------------------
# Theil-Sen trend (median of pairwise slopes) on daily series
# ---------------------------------------------------------------------------


def _ts_slope(dialect: str) -> str:
    """Signed round-half-away((dy * 1e6) / dx) with nonneg operands in
    each branch, so floor == truncation on both engines."""
    div = "DIV" if dialect == "spark" else "//"
    return (
        "CASE WHEN dy >= 0 THEN (2 * dy * 1000000 + dx) {d} (2 * dx)"
        " ELSE -((-2 * dy * 1000000 + dx) {d} (2 * dx)) END"
    ).format(d=div)


_THEIL_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS typ,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.typ, b.c - a.c AS dy, b.d - a.d AS dx
  FROM daily a JOIN daily b ON a.typ = b.typ AND a.d < b.d
),
slopes AS (SELECT typ, CAST({{s}} AS BIGINT) AS slope_e6 FROM pairs),
r AS (
  SELECT typ, slope_e6,
         ROW_NUMBER() OVER (PARTITION BY typ ORDER BY slope_e6) AS rn,
         COUNT(*) OVER (PARTITION BY typ) AS np
  FROM slopes
)
SELECT typ, CAST(MIN(np) AS BIGINT) AS n_pairs,
       CAST(MIN(CASE WHEN rn = (np + 1) // 2 THEN slope_e6 END) AS BIGINT)
         AS slope_med_e6
FROM r GROUP BY typ ORDER BY typ
""".format(s=_ts_slope("duck"))


@register("t14_theil_sen_trend", oracle=_THEIL_ORACLE, tags=("T1", "statistics"))
def t14_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen trend estimator per event type: the (lower) median of
    all pairwise slopes (c_b - c_a) / (d_b - d_a) over the daily count
    series — the robust alternative to OLS (ml_ols_fit) that a single
    outlier day cannot move.  Slopes are exact 1e-6 fixed point via the
    signed round-half-away decomposition (nonneg operands in each CASE
    branch, so integer division is engine-portable); the median is the
    lower order statistic, same discipline as events_anomaly_mad.

    Scale design: Theil-Sen is quadratic BY DEFINITION, so the only
    scalable shape is histogram-then-quadratic: the 100 TB log first
    collapses to calendar-sized daily cells (one partial-agg shuffle),
    and the pair expansion runs over days-within-type — bounded by the
    calendar, not the corpus (same envelope as ml_decision_stump's
    threshold grid).  The pair join is a self-equi-join on type.

    Reference analogue: none (robust-statistics surface beside OLS and
    MAD)."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr(
            "event_type AS typ",
            "datediff(CAST(ts AS DATE), DATE '1970-01-01') AS d",
        )
        .groupBy("typ", "d")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()  # tiny; joined with itself
    )
    pairs = (
        daily.alias("a")
        .join(daily.alias("b"), "typ")
        .filter(F.col("a.d") < F.col("b.d"))
        .selectExpr("typ", "b.c - a.c AS dy", "b.d - a.d AS dx")
    )
    slopes = pairs.selectExpr("typ", f"CAST({_ts_slope('spark')} AS BIGINT) AS slope_e6")
    r = slopes.select(
        "typ",
        "slope_e6",
        F.row_number()
        .over(Window.partitionBy("typ").orderBy("slope_e6"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("typ")).alias("np"),
    )
    return (
        r.groupBy("typ")
        .agg(
            F.min("np").cast("long").alias("n_pairs"),
            F.min(F.when(F.col("rn") == F.expr("(np + 1) DIV 2"), F.col("slope_e6")))
            .cast("long")
            .alias("slope_med_e6"),
        )
        .orderBy("typ")
    )


# ---------------------------------------------------------------------------
# seasonal (hour-of-day) profile: the per-season baseline anomaly
# detectors and capacity planners subtract before looking at residuals.
# ---------------------------------------------------------------------------


@register(
    "t15_seasonal_profile",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
         CAST(ROUND(value * 10000) AS BIGINT) AS v4
  FROM events
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n FROM h GROUP BY 1
)
SELECT h.event_type, hod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v4) AS BIGINT) AS value_sum_4,
       CAST(COUNT(*) * 24 * 1000000 // MAX(type_n) AS BIGINT)
         AS share_vs_uniform_ppm
FROM h JOIN tot USING (event_type)
GROUP BY 1, 2
""",
    tags=("T1", "timeseries"),
)
def t15_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per event type: per (type, hour)
    the event count, exact fixed-point value mass, and the hour's
    traffic share relative to a uniform 24-hour spread (ppm, integer) —
    the seasonal index an anomaly detector divides out before flagging
    residuals (t13_cusum / events_spike_detection consume exactly this
    shape).  Two partial-agg exchanges on tiny key spaces (type, then
    type x 24); the per-type totals come back via a BROADCAST join, so
    the event stream is shuffled once and only (type, hod) rows move
    after that."""
    ev = table(spark, sf_dir, "events")
    h = ev.selectExpr(
        "event_type",
        "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod",
        "CAST(ROUND(value * 10000) AS BIGINT) AS v4",
    )
    tot = h.groupBy("event_type").agg(F.count("*").cast("long").alias("type_n"))
    return (
        h.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "hod")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v4").cast("long").alias("value_sum_4"),
            F.expr("CAST(COUNT(*) * 24 * 1000000 DIV MAX(type_n) AS BIGINT)")
            .alias("share_vs_uniform_ppm"),
        )
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
