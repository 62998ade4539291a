"""Gap-based sessionization + funnel analytics over the events table
(§2.8 date/time extension; batch analogue of the streaming session
window, plans/streaming.py stream_session_window).

The reference has no wall-clock session concept — its "session" axis is
run/luminosity-block integers (python/io.py:115-140 lumi masks) — but any
clickstream/training-telemetry user of this engine needs gap
sessionization, so it is registered as a first-class oracle-checked
operator family.

Scale design: one shuffle on user_id for the window, then the session
aggregate reuses the same partitioning (groupBy user_id, session_id is a
prefix-key aggregation — no second exchange of the full data). At 100 TB
the events table is range-partitioned by date and bucketed by user_id, so
the window sort is per-bucket; session state never materializes globally
(unlike the streaming variant, which bounds state by the watermark
horizon instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register

# 12 h in microseconds: below the per-user median gap (~7.3 h at sf0.01)
# so most sessions are multi-event, above the 75th pct so they still split
_GAP_US = 12 * 3600 * 1_000_000


@register(
    "sessionize_events",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, value, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM t
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(us) AS start_us,
       MAX(us) AS end_us,
       {exact_sum_sql("value", 2)} AS value_sum
FROM s
GROUP BY 1, 2
""",
    tags=("T4", "date", "sessions"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds 12 h.  lag + running-sum of
    session-break flags over one user_id window, then a per-session
    aggregate that reuses the window's partitioning."""
    ev = table(spark, sf_dir, "events")
    # fixtures store TIMESTAMP_NTZ; session tz is pinned UTC (session.py:47)
    # so the cast to TIMESTAMP is epoch-preserving and matches epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(_GAP_US)), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = (
        ev.select("user_id", "event_id", "value", us.alias("us"), is_new.alias("is_new"))
        .withColumn("session_id", F.sum("is_new").over(run))
    )
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        exact_sum(F.col("value"), 2).alias("value_sum"),
    )


@register(
    "session_funnel",
    oracle=f"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, event_type
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN us END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN us END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN us END) AS t_purchase
  FROM t GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_view,
       CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_view_click,
       CAST(COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
            AS BIGINT) AS n_view_click_purchase
FROM firsts
WHERE t_view IS NOT NULL
""",
    tags=("T5", "date", "sessions"),
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first click
    precedes their first purchase.  One conditional-MIN aggregate per
    user (single shuffle), then a global roll-up — the standard funnel
    shape; no self-joins, so it scales linearly in events."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t = ev.filter(F.col("event_type").isin("view", "click", "purchase")).select(
        "user_id", us.alias("us"), "event_type"
    )
    firsts = t.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias("t_purchase"),
    )
    return firsts.filter(F.col("t_view").isNotNull()).agg(
        F.count("*").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# time-series anomaly detection: trailing-window z-score spikes
# ---------------------------------------------------------------------------

_SPIKE_TRAIL = 24  # trailing window, in OBSERVED hours (row frame)
_SPIKE_MIN_N = 12  # need at least this many trailing hours to judge
_SPIKE_Z = 3.0


@register(
    "events_spike_detection",
    oracle=f"""
WITH hourly AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT hour_us, n,
         SUM(n) OVER tw AS s,
         SUM(n * n) OVER tw AS sq,
         COUNT(*) OVER tw AS c
  FROM hourly
  WINDOW tw AS (ORDER BY hour_us
                ROWS BETWEEN {_SPIKE_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT hour_us, n,
       CAST(CASE WHEN c >= {_SPIKE_MIN_N} AND
              CAST(n AS DOUBLE) >
                CAST(s AS DOUBLE) / CAST(c AS DOUBLE)
                + {_SPIKE_Z} * sqrt(GREATEST(
                    (CAST(sq AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
                    / CAST(c - 1 AS DOUBLE), CAST(0 AS DOUBLE)))
            THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM w
""",
    tags=("T6", "date", "monitoring"),
)
def events_spike_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection on hourly event counts:
    an hour is a spike when its count exceeds mean + 3*sigma of the
    previous {_SPIKE_TRAIL} observed hours (row frame, so sparse hours
    degrade gracefully; a time-range frame is the RANGE BETWEEN variant).
    All window sums are BIGINT (exact, order-free); the mean/variance/
    sqrt scalar math is written identically on both engines, so even the
    float comparisons are bit-reproducible.  Scale: one groupBy(hour)
    partial-agg collapses the raw events; the window then runs on the
    tiny hourly table."""
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
                "hour_us"
            )
        )
        .agg(F.count("*").alias("n"))
    )
    tw = Window.orderBy("hour_us").rowsBetween(-_SPIKE_TRAIL, -1)
    w = hourly.select(
        "hour_us",
        "n",
        F.sum("n").over(tw).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("sq"),
        F.count("*").over(tw).alias("c"),
    )
    mean = F.col("s").cast("double") / F.col("c").cast("double")
    var = F.greatest(
        (
            F.col("sq").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("c").cast("double")
        )
        / (F.col("c") - 1).cast("double"),
        F.lit(0.0),
    )
    return w.select(
        "hour_us",
        "n",
        (
            (F.col("c") >= _SPIKE_MIN_N)
            & (F.col("n").cast("double") > mean + _SPIKE_Z * F.sqrt(var))
        )
        .cast("long")
        .alias("is_spike"),
    )


# ---------------------------------------------------------------------------
# retention cohorts: the other canonical clickstream rollup — group users
# by first-seen week, count distinct active users per (cohort week,
# weeks-since-cohort).  Week arithmetic is integer epoch-microsecond division so
# both engines bin identically (no calendar/locale functions).
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "events_retention_cohorts",
    oracle=f"""
WITH wk AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events
),
cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY user_id
),
active AS (
  SELECT DISTINCT w.user_id, c.cohort_wk, w.wk - c.cohort_wk AS week_offset
  FROM wk w JOIN cohort c USING (user_id)
)
SELECT cohort_wk, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM active GROUP BY 1, 2
""",
    tags=("sessions", "date/time"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-active week,
    distinct active users per (cohort week, week offset).  Both
    aggregations key on user_id first — the cohort min, the activity
    distinct, and their join all share one user_id partitioning, so at
    100 TB (events bucketed by user_id) only the final small cohort
    rollup exchanges data."""
    ev = table(spark, sf_dir, "events")
    # integer div, not `/`: a double quotient can land an ulp above an
    # exact multiple and flip the floor against DuckDB's integer `//`
    wk = ev.selectExpr(
        "user_id",
        f"unix_micros(CAST(ts AS TIMESTAMP)) div {_WEEK_US} AS wk",
    )
    cohort = wk.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    active = (
        wk.join(cohort, "user_id")
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .distinct()
    )
    return active.groupBy("cohort_wk", "week_offset").agg(
        F.count("*").cast("long").alias("n_active_users")
    )


# ---------------------------------------------------------------------------
# robust (median/MAD) anomaly profile per event type
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (SELECT event_type, value AS med, n FROM r WHERE rn = (n + 1) // 2),
r2 AS (
  SELECT e.event_type, ABS(e.value - m.med) AS dev, m.med, m.n,
         ROW_NUMBER() OVER (PARTITION BY e.event_type
                            ORDER BY ABS(e.value - m.med)) AS rn
  FROM events e JOIN med m USING (event_type)
),
mad AS (SELECT event_type, med, n, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
SELECT m.event_type, m.med, m.mad,
       CAST(m.n AS BIGINT) AS n,
       CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN mad m USING (event_type)
GROUP BY m.event_type, m.med, m.mad, m.n
""",
    tags=("monitoring", "robust-stats"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly profile per event type: median and MAD (median
    absolute deviation) as EXACT lower-median order statistics (rank
    (n+1)/2 after one per-type sort — the udaf_grouped_median convention,
    engine-deterministic where interpolating medians are not), then the
    |v - med| > 3*MAD outlier census.  Three passes over events, each a
    per-type window or partial-agg join — the robust twin of
    events_spike_detection's mean/stddev z-score.  Group count is bounded
    (event types); a giant-group deployment swaps the exact median for
    a8_quantiles' approx path, same plan shape."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select("event_type", "value")
    wt = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(wt.orderBy("value")).alias("rn"),
        F.count("*").over(wt).alias("n"),
    )
    med = r.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "event_type", F.col("value").alias("med"), "n"
    )
    d = ev.join(med, "event_type").withColumn("dev", F.abs(F.col("value") - F.col("med")))
    r2 = d.select(
        "event_type",
        "med",
        "n",
        "dev",
        F.row_number().over(wt.orderBy("dev")).alias("rn"),
    )
    mad = r2.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "event_type", "med", "n", F.col("dev").alias("mad")
    )
    return (
        ev.join(mad, "event_type")
        .groupBy("event_type", "med", "mad", "n")
        .agg(
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select("event_type", "med", "mad", F.col("n").cast("long").alias("n"), "n_outliers")
    )


# ---------------------------------------------------------------------------
# next-action Markov transition matrix
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
),
t AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
),
m AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS row_n FROM t)
SELECT src, dst, n, CAST((n * 1000000) // row_n AS BIGINT) AS p_e6,
       CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY n DESC, dst ASC)
         AS BIGINT) AS rank
FROM m ORDER BY src, rank
"""


@register("seq_markov_transitions", oracle=_MARKOV_ORACLE, tags=("sessions", "sequence"))
def seq_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    consecutive event pair within a user's timeline, count src -> dst
    transitions and emit the row-normalized probability (exact 1e-6
    fixed point) plus the per-source rank — the model behind next-action
    prediction, funnel-drop simulation, and synthetic-clickstream
    generation.

    Scale design: one hash exchange on user_id feeds the LEAD window
    (per-partition sort), after which the transition counts partial-
    aggregate down to |event types|^2 cells — the model is metadata-
    sized no matter how large the event log, and the row normalization
    and ranking run on those cells only.  This is the same
    window-then-collapse shape as sessionize_events, reusing its
    user_id partitioning end to end.

    Reference analogue: the ordered channel cascade (P6) picks the
    first matching state per event; this learns the empirical state-
    to-state dynamics instead."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count("*").cast("long").alias("n"))
    m = t.withColumn(
        "row_n", F.sum("n").over(Window.partitionBy("src")).cast("long")
    )
    rk = Window.partitionBy("src").orderBy(F.col("n").desc(), F.col("dst").asc())
    return (
        m.selectExpr("src", "dst", "n", "CAST((n * 1000000) DIV row_n AS BIGINT) AS p_e6")
        .withColumn("rank", F.row_number().over(rk).cast("long"))
        .orderBy("src", "rank")
    )


# ---------------------------------------------------------------------------
# strict-progression funnel via a DFA fold over each user's event stream
# ---------------------------------------------------------------------------

_DFA_STEPS = ("view", "click", "purchase")
_DFA_GAP_US = 24 * 3600 * 1_000_000  # each step must land within 24 h


def _dfa_oracle() -> str:
    # Independent derivation of the SAME anchored-greedy semantics: the
    # anchor is the user's first view; each later step is the earliest
    # matching event after the previously matched step and within the
    # gap.  (With a gap window, greedy anchoring is a defined CHOICE,
    # not an optimization-free fact — see the docstring.)
    return f"""
WITH t AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
s1 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN us END) AS t1
  FROM t GROUP BY 1
),
s2 AS (
  SELECT t.user_id,
         MIN(CASE WHEN event_type = 'click' AND us > t1
                   AND us <= t1 + {_DFA_GAP_US} THEN us END) AS t2
  FROM t JOIN s1 ON t.user_id = s1.user_id GROUP BY 1
),
s3 AS (
  SELECT t.user_id,
         MIN(CASE WHEN event_type = 'purchase' AND us > t2
                   AND us <= t2 + {_DFA_GAP_US} THEN us END) AS t3
  FROM t JOIN s2 ON t.user_id = s2.user_id GROUP BY 1
),
st AS (
  SELECT s1.user_id,
         CASE WHEN t3 IS NOT NULL THEN 3
              WHEN t2 IS NOT NULL THEN 2
              WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
  FROM s1 JOIN s2 ON s1.user_id = s2.user_id
          JOIN s3 ON s1.user_id = s3.user_id
)
SELECT CAST(stage AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
FROM st GROUP BY stage ORDER BY stage
"""


@register("seq_dfa_funnel", oracle=_dfa_oracle(), tags=("sessions", "sequence"))
def seq_dfa_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel as a state machine: view -> click -> purchase,
    each step strictly later than the matched previous step and within
    24 h of it, evaluated over each user's FULL ordered event stream.
    Semantics are anchored-greedy (the ClickHouse-windowFunnel family):
    the chain anchors at the first view and each step matches its
    earliest feasible event — a defined choice that can under-count
    vs trying every anchor (optimal-anchor matching needs a per-anchor
    scan; the mirror test pins greedy <= optimal).  The Spark plan runs
    an actual DFA: the (ts-sorted) event array folds through
    aggregate() with a (state, matched_ts) struct accumulator — the
    sequential state machine SQL windows cannot express, run as one
    whole-stage-codegen expression.  The oracle decides the same
    semantics by the closed-form nested conditional MINs — an
    independent derivation that proves the fold.

    Scale design: one groupBy(user) shuffle builds the per-user arrays
    (the envelope every sessionization op here accepts); the fold is
    map-side, zero-shuffle, one state per user, partially aggregated
    into the 4-row funnel report.  Arbitrary regex-style patterns
    (MATCH_RECOGNIZE's core) compile to the same fold with a bigger
    state table.

    Reference analogue: P6's ordered channel cascade is a priority
    CASE; this is the temporal-order generalization."""
    ev = table(spark, sf_dir, "events")
    seq = (
        ev.selectExpr(
            "user_id",
            "named_struct('us', unix_micros(CAST(ts AS TIMESTAMP)),"
            " 'eid', event_id, 'typ', event_type) AS e",
        )
        .groupBy("user_id")
        .agg(F.expr("sort_array(collect_list(e))").alias("seq"))
    )
    fold = (
        "aggregate(seq, named_struct('state', 0, 't', CAST(-1 AS BIGINT)),"
        " (s, e) -> CASE"
        "   WHEN s.state = 0 AND e.typ = 'view'"
        "     THEN named_struct('state', 1, 't', e.us)"
        f"   WHEN s.state = 1 AND e.typ = 'click' AND e.us > s.t"
        f"        AND e.us <= s.t + {_DFA_GAP_US}"
        "     THEN named_struct('state', 2, 't', e.us)"
        f"   WHEN s.state = 2 AND e.typ = 'purchase' AND e.us > s.t"
        f"        AND e.us <= s.t + {_DFA_GAP_US}"
        "     THEN named_struct('state', 3, 't', e.us)"
        "   ELSE s END"
        ").state"
    )
    return (
        seq.selectExpr(f"CAST({fold} AS BIGINT) AS stage")
        .groupBy("stage")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# marketing attribution: each conversion credited to the FIRST and LAST
# preceding touch (click) of the same user — the two canonical
# attribution models, computed in one windowed pass.
# ---------------------------------------------------------------------------


@register(
    "events_attribution_first_last",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(ROUND(value * 10000) AS BIGINT) AS v4,
         CASE WHEN event_type = 'click'
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS click_k
  FROM events
),
w AS (
  SELECT *,
         FIRST_VALUE(click_k IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS first_k,
         LAST_VALUE(click_k IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_k
  FROM e
)
SELECT COALESCE(first_k, -1) AS first_touch_k,
       COALESCE(last_k, -1) AS last_touch_k,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(v4) AS BIGINT) AS value_sum_4
FROM w
WHERE event_type = 'purchase'
GROUP BY 1, 2
""",
    tags=("sessions", "W4"),
)
def events_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution in ONE windowed
    pass: per user (ordered by ts with event_id tie-break — fully
    deterministic), every row carries the first and the latest preceding
    click's campaign key (running FIRST/LAST ... IGNORE NULLS over the
    unbounded-preceding frame); conversions ('purchase') then roll up per
    (first_touch, last_touch) cell with exact fixed-point revenue.
    -1 marks conversions with no preceding click (organic).  Scale: one
    shuffle on user_id (bounded per-user partitions), map-side JSON
    extraction, and a tiny final rollup — the same shape a 100 TB
    clickstream attribution job runs nightly."""
    ev = table(spark, sf_dir, "events")
    e = ev.selectExpr(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "CAST(ROUND(value * 10000) AS BIGINT) AS v4",
        "CASE WHEN event_type = 'click'"
        " THEN CAST(get_json_object(props, '$.k') AS BIGINT) END AS click_k",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "first_k", F.first("click_k", ignorenulls=True).over(w)
    ).withColumn("last_k", F.last("click_k", ignorenulls=True).over(w))
    return (
        flagged.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("first_k"), F.lit(-1)).alias("first_touch_k"),
            F.coalesce(F.col("last_k"), F.lit(-1)).alias("last_touch_k"),
        )
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.sum("v4").cast("long").alias("value_sum_4"),
        )
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
