"""Core relational slice: scans, filters, projections, equi-joins, hash
aggregates, set ops (SURVEY.md §2.1-2.4, §2.7 ★ operators).

Each query mirrors a reference operator (file:line cited per query) but is
expressed as the Spark plan you'd actually want at 100 TB: filters that
push to the parquet scan, broadcast joins for dims, partial+final hash
aggregation, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_avg, exact_avg_sql, exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Flagship: the copperhead "selection + yield" shape
# (stage-1 skeleton: scan -> filter -> join -> label -> weighted aggregate;
#  /root/reference/stage1/processor.py:226-283,468-503)
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
SELECT
  CASE WHEN o_totalprice < 50000 THEN 'z-peak'
       WHEN o_totalprice < 150000 THEN 'h-sidebands'
       ELSE 'h-peak' END AS region,
  l_returnflag,
  COUNT(*) AS n_events,
  {exact_sum_sql("l_extendedprice * (1 - l_discount)")} AS yield_sum,
  {exact_sum_sql("l_quantity", 0)} AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity > 5 AND l_discount >= 0.02 AND l_discount <= 0.08
  AND o_orderstatus <> 'P'
GROUP BY 1, 2
"""


@register("flagship_selection_yield", oracle=_FLAGSHIP_ORACLE, tags=("flagship", "P1", "P5", "J1", "A6"))
def flagship_selection_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event selection -> region labeling -> weighted yields per (region,
    flag).  Mirrors stage-1's select->derive->label->aggregate skeleton
    (processor.py:243-283 selection, 471-478 region CASE, histogrammer
    yields).  Filters push down to the lineitem scan; the orders join
    shuffles on the join key and AQE handles the rest."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sel = li.filter(
        (F.col("l_quantity") > 5)
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.08)
    )
    joined = sel.join(orders, sel.l_orderkey == orders.o_orderkey).filter(
        F.col("o_orderstatus") != "P"
    )
    region = (
        F.when(F.col("o_totalprice") < 50000, "z-peak")
        .when(F.col("o_totalprice") < 150000, "h-sidebands")
        .otherwise("h-peak")
    )
    return (
        joined.withColumn("region", region)
        .groupBy("region", "l_returnflag")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("yield_sum"),
            exact_sum(F.col("l_quantity"), 0).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A4/A6: hash aggregates (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {exact_sum_sql("l_quantity", 0)} AS sum_qty,
  {exact_sum_sql("l_extendedprice")} AS sum_base_price,
  {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
  {exact_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
  {exact_avg_sql("l_quantity", 0)} AS avg_qty,
  {exact_avg_sql("l_extendedprice")} AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("a6_pricing_summary", oracle=_Q1_ORACLE, tags=("A1", "A4", "A6"))
def a6_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped weighted yields (histogrammer.py:105-116 analogue; TPC-H Q1
    shape). One shuffle, partial+final hash agg, scan reads only the six
    referenced columns."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), 0).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            exact_avg(F.col("l_quantity"), 0).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a1_count_per_group",
    oracle="""
SELECT l_orderkey AS order_id,
       COUNT(*) AS n_items,
       COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_orderkey
""",
    tags=("A1",),
)
def a1_count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group counts — muons/jets per event (processor.py:252-257,649).
    groupBy on the child key; at scale this is the canonical partial-agg
    shuffle on event_id."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.count("*").alias("n_items"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )


@register(
    "a4_global_aggregates",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {exact_sum_sql("l_quantity", 0)} AS total_qty,
       {exact_sum_sql("l_extendedprice")} AS total_price,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
""",
    tags=("A4", "A12"),
)
def a4_global_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global normalization constants (sumGenWgts, preprocessor.py:153-183;
    btag renorm btag_weights.py:63-69): one all-reduce to a single row,
    broadcast back by the caller."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        exact_sum(F.col("l_quantity"), 0).alias("total_qty"),
        exact_sum(F.col("l_extendedprice")).alias("total_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "a7_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey % 10 AS supp_bucket FROM lineitem",
    tags=("A7", "U3"),
)
def a7_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over categorical labels (postprocessor.py:37-38 unique());
    hash-agg dedup, partial on map side."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag", "l_linestatus", (F.col("l_suppkey") % 10).alias("supp_bucket")
    ).distinct()


# ---------------------------------------------------------------------------
# P-series: filters / predicates / CASE labeling
# ---------------------------------------------------------------------------


@register(
    "p1_conjunctive_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem
WHERE l_quantity >= 30 AND l_quantity < 40
  AND l_discount > 0.03 AND l_extendedprice < 50000
  AND l_returnflag = 'N'
""",
    tags=("P1",),
)
def p1_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive object selection (muon cuts, processor.py:243-249).
    All five predicates reach the parquet scan as PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_quantity") < 40)
        & (F.col("l_discount") > 0.03)
        & (F.col("l_extendedprice") < 50000)
        & (F.col("l_returnflag") == "N")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


@register(
    "p2_or_of_booleans",
    oracle="""
SELECT event_type, COUNT(*) AS n_pass
FROM events
WHERE event_type = 'click' OR value > 900 OR user_id % 97 = 0
GROUP BY event_type
""",
    tags=("P2",),
)
def p2_or_of_booleans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLT pass = OR of trigger booleans (processor.py:151-156)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "click")
            | (F.col("value") > 900)
            | (F.col("user_id") % 97 == 0)
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_pass"))
    )


@register(
    "p3_and_of_booleans",
    oracle="""
SELECT COUNT(*) AS n_pass
FROM events
WHERE event_type <> 'error' AND value >= 10 AND value <= 990 AND user_id > 0
""",
    tags=("P3",),
)
def p3_and_of_booleans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event quality = AND of Flag_* booleans (processor.py:234-235)."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") != "error")
        & (F.col("value") >= 10)
        & (F.col("value") <= 990)
        & (F.col("user_id") > 0)
    ).agg(F.count("*").alias("n_pass"))


@register(
    "p5_case_region_label",
    oracle=f"""
SELECT
  CASE WHEN o_totalprice < 60000 THEN 'z-peak'
       WHEN o_totalprice >= 60000 AND o_totalprice < 110000 THEN 'h-sidebands'
       WHEN o_totalprice >= 110000 AND o_totalprice < 150000 THEN 'h-peak'
       ELSE 'overflow' END AS region,
  COUNT(*) AS n,
  {exact_sum_sql("o_totalprice")} AS region_total
FROM orders
GROUP BY 1
""",
    tags=("P5",),
)
def p5_case_region_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-condition CASE labeling (z-peak/h-sidebands/h-peak,
    processor.py:471-478)."""
    orders = table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    region = (
        F.when(tp < 60000, "z-peak")
        .when((tp >= 60000) & (tp < 110000), "h-sidebands")
        .when((tp >= 110000) & (tp < 150000), "h-peak")
        .otherwise("overflow")
    )
    return orders.groupBy(region.alias("region")).agg(
        F.count("*").alias("n"),
        exact_sum(tp).alias("region_total"),
    )


@register(
    "p6_channel_cascade",
    oracle="""
SELECT
  CASE WHEN l_quantity >= 45 AND l_discount > 0.06 THEN 'ttHorVH'
       WHEN l_quantity >= 45 THEN 'vbf'
       WHEN l_quantity >= 25 AND l_tax > 0.04 THEN 'ggh_2orMoreJets'
       WHEN l_quantity >= 25 THEN 'ggh_1jet'
       ELSE 'ggh_0jets' END AS channel,
  COUNT(*) AS n
FROM lineitem
GROUP BY 1
""",
    tags=("P6",),
)
def p6_channel_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered priority cascade (categorizer.py:1-23 channel split): the
    first matching WHEN wins, exactly like the reference's sequential
    mask assignment."""
    li = table(spark, sf_dir, "lineitem")
    q, d, t = F.col("l_quantity"), F.col("l_discount"), F.col("l_tax")
    channel = (
        F.when((q >= 45) & (d > 0.06), "ttHorVH")
        .when(q >= 45, "vbf")
        .when((q >= 25) & (t > 0.04), "ggh_2orMoreJets")
        .when(q >= 25, "ggh_1jet")
        .otherwise("ggh_0jets")
    )
    return li.groupBy(channel.alias("channel")).agg(F.count("*").alias("n"))


@register(
    "p7_membership_fold",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem
WHERE l_returnflag IN ('A', 'R') AND l_orderkey % 4 IN (0, 1)
GROUP BY l_returnflag
""",
    tags=("P7",),
)
def p7_membership_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isin membership + k-fold selection `event % nfolds IN (...)`
    (processor.py:503; mva_evaluators.py:158-160)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R") & (F.col("l_orderkey") % 4).isin(0, 1)
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# J-series: joins
# ---------------------------------------------------------------------------


@register(
    "j1_star_join_revenue",
    oracle=f"""
SELECT n_name,
       COUNT(*) AS n_items,
       {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
""",
    tags=("J1", "J5"),
)
def j1_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index equi-join chain (cross-reference joins, fsr_recovery.py:6-13;
    jets.py:14-17).  nation is broadcast (25 rows); lineitem->orders->
    customer shuffle on their keys with AQE sizing."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
        )
    )


@register(
    "j5_broadcast_dim_join",
    oracle="""
SELECT r_name,
       COUNT(*) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=("J5",),
)
def j5_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast scalar-map join (lumi-weight per dataset,
    processor.py:127; preprocessor.py:211-229): small side broadcast, no
    shuffle of the big side."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )


@register(
    "j2_anti_join",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o_orderpriority
""",
    tags=("J2",),
)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join with predicate (DR-cleaning drop semantics,
    processor.py:561-577: drop jets near a selected muon -> here drop
    orders having any high-quantity item).  left_anti after pushing the
    predicate into the right side."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "j3_forall_quantified",
    oracle="""
SELECT COUNT(*) AS n_suppliers
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey AND l.l_tax >= 0.05
  )
""",
    tags=("J3",),
)
def j3_forall_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified ALL predicate (gen-jet isolated from *all* leptons,
    jets.py:186-203: ak.all(dr>0.3)) = semi-join(any) + anti-join(violating):
    suppliers all of whose items have tax < 0.05."""
    sup = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    violators = li.filter(F.col("l_tax") >= 0.05)
    return (
        sup.join(li, sup.s_suppkey == li.l_suppkey, "left_semi")
        .join(violators, F.col("s_suppkey") == violators.l_suppkey, "left_anti")
        .agg(F.count("*").alias("n_suppliers"))
    )


@register(
    "j11_aggregate_back_join",
    oracle=f"""
SELECT o_orderkey, o_orderstatus,
       COALESCE(n_items, 0) AS n_items,
       COALESCE(qty_sum, 0.0) AS qty_sum
FROM orders
LEFT JOIN (
  SELECT l_orderkey, COUNT(*) AS n_items,
         {exact_sum_sql("l_quantity", 0)} AS qty_sum
  FROM lineitem WHERE l_discount > 0.05 GROUP BY l_orderkey
) agg ON o_orderkey = l_orderkey
""",
    tags=("J11", "P10"),
)
def j11_aggregate_back_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-back join + sentinel fill (per-event njets aligned back
    onto events with fillna(0), processor.py:649-650,715-735): the
    pandas index-alignment semantics made explicit as left join +
    coalesce."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    per_order = (
        li.filter(F.col("l_discount") > 0.05)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items_raw"),
            exact_sum(F.col("l_quantity"), 0).alias("qty_sum_raw"),
        )
    )
    return orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce(F.col("n_items_raw"), F.lit(0)).alias("n_items"),
        F.coalesce(F.col("qty_sum_raw"), F.lit(0.0)).alias("qty_sum"),
    )


# ---------------------------------------------------------------------------
# U-series: set operations
# ---------------------------------------------------------------------------


@register(
    "u1_union_all",
    oracle=f"""
SELECT src, COUNT(*) AS n, {exact_sum_sql("l_extendedprice")} AS price_sum
FROM (
  SELECT 'lo_disc' AS src, l_extendedprice FROM lineitem WHERE l_discount < 0.02
  UNION ALL
  SELECT 'hi_qty' AS src, l_extendedprice FROM lineitem WHERE l_quantity > 48
)
GROUP BY src
""",
    tags=("U1",),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of per-source frames (dd.concat, io.py:73) via
    unionByName — in production this is a multi-path scan, no shuffle."""
    li = table(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_discount") < 0.02).select(
        F.lit("lo_disc").alias("src"), "l_extendedprice"
    )
    hi = li.filter(F.col("l_quantity") > 48).select(
        F.lit("hi_qty").alias("src"), "l_extendedprice"
    )
    return (
        lo.unionByName(hi)
        .groupBy("src")
        .agg(F.count("*").alias("n"), exact_sum(F.col("l_extendedprice")).alias("price_sum"))
    )


@register(
    "u3_dedup_pairs",
    oracle="SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_orderkey % 10 = 3",
    tags=("U3",),
)
def u3_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a projected key pair (config dedup / fit-result
    drop_duplicates, postprocessor.py:33-35, fitter.py:42-49)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 10 == 3)
        .select("l_partkey", "l_suppkey")
        .dropDuplicates()
    )
