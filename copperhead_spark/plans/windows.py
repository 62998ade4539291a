"""Window/top-k layer: ranking, nth-per-group, argmax, cumulative sums,
quantiles (SURVEY.md §2.4 A3/A8/A10/A12, §2.5 W1-W4, §2.6 O2/O3 ★).

This layer unlocks the reference's dimuon/dijet pairing pattern: pick the
top-2 objects per event by pt and pivot them into one wide row
(/root/reference/stage1/processor.py:295-318,655-667).

Scale note: every window here partitions by a high-cardinality key (order,
customer, nation), so the sort is per-partition after a hash shuffle —
no global sort. The two global-ordered queries (o2 top-k, a10 bin edges)
run on aggregated/limited data by construction, which is the only place a
single-partition window is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register


@register(
    "j4_top2_pivot",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_extendedprice, l_quantity,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_extendedprice DESC, l_linenumber ASC
         ) AS rn
  FROM lineitem
)
SELECT l_orderkey AS order_id,
       MAX(CASE WHEN rn = 1 THEN l_extendedprice END) AS li1_price,
       MAX(CASE WHEN rn = 2 THEN l_extendedprice END) AS li2_price,
       MAX(CASE WHEN rn = 1 THEN l_quantity END)
         + MAX(CASE WHEN rn = 2 THEN l_quantity END) AS pair_qty,
       MAX(CASE WHEN rn = 2 THEN l_extendedprice END)
         / MAX(CASE WHEN rn = 1 THEN l_extendedprice END) AS price_ratio
FROM ranked
WHERE rn <= 2
GROUP BY l_orderkey
HAVING COUNT(*) = 2
""",
    tags=("J4", "A3", "W1", "W2", "O3"),
)
def j4_top2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimuon pairing: leading/subleading object per event pivoted into one
    row (processor.py:295-318).  Window row_number -> conditional-agg
    pivot; one shuffle on the event key, no self-join."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    ranked = li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    lead = F.max(F.when(F.col("rn") == 1, F.col("l_extendedprice")))
    sub = F.max(F.when(F.col("rn") == 2, F.col("l_extendedprice")))
    return (
        ranked.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(
            lead.alias("li1_price"),
            sub.alias("li2_price"),
            (
                F.max(F.when(F.col("rn") == 1, F.col("l_quantity")))
                + F.max(F.when(F.col("rn") == 2, F.col("l_quantity")))
            ).alias("pair_qty"),
            (sub / lead).alias("price_ratio"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") == 2)
        .drop("_n")
    )


@register(
    "a3_argmax_per_group",
    oracle="""
SELECT o_custkey AS cust_id,
       o_orderkey AS best_orderkey,
       o_totalprice AS best_price
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rn
  FROM orders
) WHERE rn = 1
""",
    tags=("A3", "W3"),
)
def a3_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax (leading-muon idxmax, processor.py:296-297) with a
    pinned tie-break (highest price, then lowest orderkey — the reference's
    pandas first-match made deterministic).  Implemented as a window rank
    rather than max_by so ties are controlled explicitly."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderkey").alias("best_orderkey"),
            F.col("o_totalprice").alias("best_price"),
        )
    )


@register(
    "w1_rank_in_group",
    oracle="""
SELECT * FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 3
""",
    tags=("W1", "W2", "O1", "O3"),
)
def w1_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking within group + top-k (pt-ordered jet re-numbering,
    processor.py:655-667): first 3 events per user in time order."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "rn")
    )


@register(
    "w4_cumsum_per_group",
    oracle=f"""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_scaled
FROM orders
""",
    tags=("W4", "A10"),
)
def w4_cumsum_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum (wgt cumsum, categorizer.py:94-99), keyed per
    customer so the sort is per-partition.  Kept in scaled-integer space:
    exact, order-stable, and what you'd feed a bin-edge derivation."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(w)
        .alias("running_scaled"),
    )


@register(
    "a10_yield_bin_edges",
    oracle=f"""
WITH per_supp AS (
  SELECT l_suppkey AS suppkey,
         {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_scaled
  FROM lineitem GROUP BY l_suppkey
)
SELECT suppkey, revenue,
       CAST(SUM(rev_scaled) OVER (
         ORDER BY rev_scaled DESC, suppkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) // 500000000000 AS BIGINT) AS yield_bin
FROM per_supp
""",
    tags=("A10", "W4", "O2"),
)
def a10_yield_bin_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MVA-score yield binning (categorizer.py:89-117): sort groups by
    yield desc, cumulative-sum the weights, bucket at fixed targets.
    The global window runs over the *aggregated* per-supplier table
    (small by construction), matching the reference which bins on the
    driver.  Integer division keeps the bin id exact."""
    li = table(spark, sf_dir, "lineitem")
    rev_scaled = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    )
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        rev_scaled.alias("rev_scaled"),
    )
    w = (
        Window.orderBy(F.col("rev_scaled").desc(), F.col("suppkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_supp.withColumn("cum_scaled", F.sum("rev_scaled").over(w))
        .select(
            "suppkey",
            "revenue",
            F.expr("cum_scaled div 500000000000").alias("yield_bin"),
        )
    )


@register(
    "a8_quantiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       MIN(l_quantity) AS qmin,
       MAX(l_quantity) AS qmax
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("A8", "A12"),
)
def a8_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per group (score-quantile categorization,
    categorizer.py:26-37).  Uses exact `percentile` — at 100 TB swap for
    `percentile_approx` (documented accuracy/speed trade; the reference's
    driver-side pandas quantile has no scalable analogue)."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, 0.25).alias("q25"),
        F.percentile(q, 0.5).alias("q50"),
        F.percentile(q, 0.75).alias("q75"),
        F.min(q).alias("qmin"),
        F.max(q).alias("qmax"),
    )


@register(
    "o2_global_topk",
    oracle="""
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
    tags=("O2", "O3", "A12"),
)
def o2_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with rank (score-desc event ordering,
    categorizer.py:94-98).  orderBy+limit lets Spark run a per-partition
    top-k then merge k·p rows on the driver side of the exchange — no full
    global sort materialization."""
    orders = table(spark, sf_dir, "orders")
    # orderBy+limit FIRST (TakeOrderedAndProject: per-partition heaps,
    # merge of 100*p rows) and only then the rank window over the
    # 100-row slice — ranking before limiting would shuffle the whole
    # fact table into ONE task for the unpartitioned window, the exact
    # global sort this query's contract forbids
    top = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return top.withColumn("rank", F.row_number().over(w))


@register(
    "w6_ntile_deciles",
    oracle="""
WITH d AS (
  SELECT source, n_chars,
         NTILE(10) OVER (PARTITION BY source
                         ORDER BY n_chars DESC, doc_id ASC) AS decile
  FROM documents
)
SELECT source, CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM d GROUP BY source, decile
""",
    tags=("W6", "windows", "text"),
)
def w6_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile bucketing — the quality-decile split every curation
    pipeline uses to keep 'top-X% by score' per domain: documents ranked
    by length within source, cut into 10 equal buckets (NTILE's
    ceil-then-floor fill rule is identical in Spark and DuckDB), then
    per-decile stats.  Ordering is total (tie-break doc_id) so bucket
    boundaries are deterministic.  Scale: one exchange on source; NTILE
    needs the whole partition ordered, so at 100 TB the partition key
    must be finer than 'source' (e.g. source x hash-shard, deciles
    within shard approximate the global decile to sampling error) — the
    same caveat as any exact per-domain quantile."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("decile", F.ntile(10).over(w))
        .groupBy("source", F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


@register(
    "w7_range_frame_trailing_sum",
    oracle="""
SELECT user_id, event_id,
       CAST(n_trail AS BIGINT) AS n_trail,
       CAST(v_trail AS DOUBLE) / 10000.0 AS v_trail
FROM (
  SELECT user_id, event_id,
         COUNT(*) OVER tw AS n_trail,
         SUM(CAST(ROUND(value * 10000) AS BIGINT)) OVER tw AS v_trail
  FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
  WINDOW tw AS (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
)
""",
    tags=("W7", "windows", "date"),
)
def w7_range_frame_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (the frame type ROWS cannot express): per
    user, the count and exact fixed-point sum of events in the trailing
    hour INCLUDING simultaneous rows — a RANGE frame keys the boundary
    on the ORDER BY VALUE (epoch micros), so ties at the same timestamp
    all enter the frame together, where a ROWS frame would split them by
    arbitrary physical order.  That value-keyed frame is also what makes
    the result deterministic without a tie-breaking column.  Scale: one
    user_id exchange + in-partition sort, same as any per-user window;
    the frame scan is incremental (Spark's bounded-preceding RANGE
    implementation slides, not recomputes)."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tw = (
        Window.partitionBy("user_id")
        .orderBy(us.alias("us"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    v_int = F.round(F.col("value") * 10000).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(tw).cast("long").alias("n_trail"),
        (F.sum(v_int).over(tw).cast("double") / F.lit(10000.0)).alias("v_trail"),
    )


_KP_PAGE = 20


@register(
    "o6_keyset_pagination",
    oracle=f"""
WITH p1 AS (
  SELECT o_orderkey, o_totalprice FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT {_KP_PAGE}
),
anchor AS (
  SELECT o_totalprice AS ap, o_orderkey AS ak FROM p1
  ORDER BY o_totalprice ASC, o_orderkey DESC LIMIT 1
),
p2 AS (
  SELECT o_orderkey, o_totalprice FROM orders, anchor
  WHERE o_totalprice < ap OR (o_totalprice = ap AND o_orderkey > ak)
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT {_KP_PAGE}
)
SELECT 1 AS page, o_orderkey, o_totalprice FROM p1
UNION ALL
SELECT 2 AS page, o_orderkey, o_totalprice FROM p2
""",
    tags=("O6", "pagination"),
)
def o6_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: page 2 starts WHERE (price, key) sorts
    strictly after page 1's last row, so each page is a filter + top-k —
    O(page) work regardless of how deep the cursor is, where
    LIMIT/OFFSET re-sorts and discards OFFSET rows (O(depth), the
    pagination that melts at 100 TB).  The (totalprice DESC, key ASC)
    keyset is a total order, so pages are stable and gap-free; the
    anchor row ships back as two literals (scalar-subquery pattern).
    Both pages plan as TakeOrderedAndProject over a pushed-down
    filter."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    p1 = orders.orderBy(*order_cols).limit(_KP_PAGE)
    # fetching the anchor is a driver action at build time — inherent to
    # keyset pagination (the cursor IS page 1's last row; in an API
    # server it arrives from the client instead)
    last = p1.orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").desc()
    ).first()
    if last is None:  # empty table: page 2 is empty too
        p2 = orders.filter(F.lit(False))
    else:
        ap, ak = last["o_totalprice"], last["o_orderkey"]
        p2 = orders.filter(
            (F.col("o_totalprice") < F.lit(ap))
            | ((F.col("o_totalprice") == F.lit(ap)) & (F.col("o_orderkey") > ak))
        )
    p2 = p2.orderBy(*order_cols).limit(_KP_PAGE)
    return p1.select(F.lit(1).alias("page"), "o_orderkey", "o_totalprice").unionByName(
        p2.select(F.lit(2).alias("page"), "o_orderkey", "o_totalprice")
    )


@register(
    "w8_percent_rank_cume_dist",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS pct_rank_ppm,
       CAST(ROUND(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cume_dist_ppm,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    tags=("W1", "distribution-rank"),
)
def w8_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks (percent_rank / cume_dist / dense_rank) within
    a segment: the normalized-position statistics quality-score
    percentile filtering needs.  Ranks are emitted in ppm (round to
    int64) so the cross-engine compare is exact despite the float
    division both engines perform.  Partition key is low-cardinality but
    bounded (segments); at 100 TB the same window over a salted
    composite key keeps partitions executor-sized."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    ppm = lambda col: F.round(col * 1_000_000).cast("long")  # noqa: E731
    return c.select(
        "c_custkey",
        "c_mktsegment",
        ppm(F.percent_rank().over(w)).alias("pct_rank_ppm"),
        ppm(F.cume_dist().over(w)).alias("cume_dist_ppm"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


@register(
    "w9_frame_first_last_nth",
    oracle="""
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS prev_key,
       LAST_VALUE(o_orderkey) OVER w AS next_key,
       NTH_VALUE(o_orderkey, 2) OVER w AS mid_key
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
)
""",
    tags=("W2", "frame"),
)
def w9_frame_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame navigation (first/last/nth over a sliding
    3-row frame): the neighbor-context pattern (previous/next order per
    customer) without self-joins.  The frame is evaluated in one pass
    over each sorted partition — the reference does this with pandas
    shift() per group (stage2 fit windows); here it is one hash exchange
    + per-partition sort, no Python."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-1, 1)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("prev_key"),
        F.last("o_orderkey").over(w).alias("next_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("mid_key"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) via sorted running max
# ---------------------------------------------------------------------------

_PARETO_BUCKET = 100_000  # $1000 price buckets (cents DIV 1e5)

_PARETO_ORACLE = f"""
WITH pts AS (
  SELECT DISTINCT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) // {_PARETO_BUCKET}
           AS price_b,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty
  FROM lineitem
)
SELECT flag, price_b, qty FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.flag = p.flag
    AND q.price_b <= p.price_b AND q.qty >= p.qty
    AND (q.price_b < p.price_b OR q.qty > p.qty)
)
ORDER BY flag, price_b
"""


@register("o7_pareto_frontier", oracle=_PARETO_ORACLE, tags=("O4", "skyline"))
def o7_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: the Pareto-optimal set of (price bucket ↓, quantity
    ↑) points per return flag — no other point is at-least-as-good on
    both axes and strictly better on one.  The oracle states the
    textbook O(n²) NOT-EXISTS dominance definition; the Spark plan
    derives the identical set in O(n log n): collapse to max-qty per
    price bucket, sort ascending by price, and keep points whose qty
    strictly exceeds the running max over all cheaper buckets — the
    sorted-sweep equivalence that makes skylines feasible at all.

    Scale design: the distinct-point collapse is one partial-agg shuffle
    down to |flag| x |price buckets| cells, after which the sweep window
    runs over a few hundred rows per group; a 100 TB skyline is
    therefore aggregate-sized, never row-sized.  Dominance checks as
    joins (the oracle's shape) are quadratic and unrunnable there.

    Reference analogue: inverts the cutflow-optimization pattern (the
    reference scans signal-efficiency vs background-rejection by hand,
    /root/reference/stage2 category cuts) into a single declarative
    frontier."""
    li = table(spark, sf_dir, "lineitem")
    pts = (
        li.selectExpr(
            "l_returnflag AS flag",
            f"CAST(ROUND(l_extendedprice * 100) AS BIGINT) DIV {_PARETO_BUCKET}"
            " AS price_b",
            "CAST(ROUND(l_quantity) AS BIGINT) AS qty",
        )
        .groupBy("flag", "price_b")
        .agg(F.max("qty").alias("qty"))
    )
    w = (
        Window.partitionBy("flag")
        .orderBy(F.col("price_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("run", F.max("qty").over(w))
        .filter(F.col("run").isNull() | (F.col("qty") > F.col("run")))
        .select("flag", "price_b", "qty")
        .orderBy("flag", "price_b")
    )


# ---------------------------------------------------------------------------
# distinct count over a sliding frame
# ---------------------------------------------------------------------------

_W10_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(COUNT(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_prio_5
FROM orders
"""


@register("w10_window_distinct_count", oracle=_W10_ORACLE, tags=("W4", "frame"))
def w10_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation inside a sliding frame: how many distinct
    order priorities a customer used across their trailing five orders —
    the behavioral-diversity window behind churn/fraud features.  Spark
    has no COUNT(DISTINCT) OVER, so the plan uses the set-valued
    equivalent size(collect_set(...)) over the identical frame; the
    frame key (date, orderkey) is made unique so frame CONTENTS are
    deterministic under date ties on both engines.

    Scale design: one hash exchange on the partition key, per-partition
    sort, and the trailing frame holds at most 5 elements, so the
    collect_set state is O(frame), never O(partition) — the same cost
    envelope as any ROWS window.  At 100 TB the distinct-state bound is
    what matters: an unbounded-preceding distinct window would need a
    per-key set growing with history (that shape belongs to
    sketch_hll_distinct instead).

    Reference analogue: W4's running aggregates with set semantics
    added."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-4, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("long")
        .alias("distinct_prio_5"),
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
