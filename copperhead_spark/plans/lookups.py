"""Lookup/corrections layer (SURVEY.md §2.3 J6/J7/J8/J10/J12, P4, A2, F5 ★):
binned-lookup joins, piecewise-linear interpolation, interval-mask
semi-join, weight ledger, per-group signed products, as-of join.

These queries mirror how the reference applies corrections: broadcast a
small lookup, key each row into it, multiply the weights together
(stage1/corrections/*).  Physical shape everywhere: fact side never
shuffles for the lookup itself — bucket index is computed as an
expression and the lookup broadcast-equi-joins (no BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.operators.aggregates import product_agg, sign_product, sign_product_sql
from copperhead_spark.operators.asof import asof_join_backward
from copperhead_spark.operators.lookup import (
    binned_lookup_join,
    binned_lookup_join_2d,
    interp1d_expr,
    interp1d_sql,
)
from copperhead_spark.operators.weights import WeightsLedger
from copperhead_spark.plans.registry import register

# 1-D quantity-tier lookup (pileup-weight analogue, pu_reweight.py:75-85):
# bins [1,11) [11,21) [21,31) [31,41) [41,51), clamped outside
_QTY_TIER_W = [0.9731, 1.0247, 0.9863, 1.0419, 0.9577]

# the oracle spells the CLAMP explicitly (LEAST/GREATEST on the bucket
# index, like j7): a range-predicate join would DROP out-of-range values
# where the Spark plan's uniform_bucket clamps them into the edge bins —
# the two only agreed because TPC-H l_quantity happens to live in [1,50]
_J6_ORACLE = f"""
WITH lk AS (
  SELECT * FROM (VALUES
    (0, 0.9731), (1, 1.0247), (2, 0.9863), (3, 1.0419), (4, 0.9577)
  ) AS t(bin_idx, w)
)
SELECT l_returnflag, COUNT(*) AS n,
       {exact_sum_sql("CAST(w AS DOUBLE) * l_quantity", 6)} AS weighted_qty
FROM lineitem JOIN lk
  ON bin_idx = LEAST(GREATEST(CAST(FLOOR((l_quantity - 1.0) / 10.0) AS BIGINT), 0), 4)
GROUP BY l_returnflag
"""


@register("j6_binned_lookup_1d", oracle=_J6_ORACLE, tags=("J6",))
def j6_binned_lookup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D binned lookup join (pileup weight by nTrueInt,
    pu_reweight.py:75-85).  Spark plan: bucket index as an expression +
    broadcast equi-join; the oracle computes the identical clamped
    bucket index, so out-of-range values verifiably land in the edge
    bins instead of silently dropping."""
    li = table(spark, sf_dir, "lineitem")
    lk = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_QTY_TIER_W)], "bin_idx long, w double"
    )
    joined = binned_lookup_join(li, lk, F.col("l_quantity"), lo=1.0, width=10.0, nbins=5)
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        exact_sum(F.col("w") * F.col("l_quantity"), 6).alias("weighted_qty"),
    )


# 2-D (quantity-tier x price-tier) SF lookup (muon SF by (pt,|eta|),
# lepton_sf.py:79-146). Price bins: [0,27500) [27500,55000) [55000,82500)
# [82500,inf) — the open top bin mirrors the clamp.
_SF_2D = {
    (i, j): round(0.92 + 0.017 * i + 0.0093 * j + 0.0007 * i * j, 4)
    for i in range(5)
    for j in range(4)
}

_J7_VALUES = ", ".join(f"({i}, {j}, {w})" for (i, j), w in sorted(_SF_2D.items()))

_J7_ORACLE = f"""
WITH lk AS (SELECT * FROM (VALUES {_J7_VALUES}) AS t(qbin, pbin, sf))
SELECT l_returnflag, COUNT(*) AS n,
       {exact_sum_sql("CAST(sf AS DOUBLE)", 6)} AS sf_sum
FROM lineitem JOIN lk
  ON qbin = LEAST(GREATEST(CAST(FLOOR((l_quantity - 1.0) / 10.0) AS BIGINT), 0), 4)
 AND pbin = LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 27500.0) AS BIGINT), 0), 3)
GROUP BY l_returnflag
"""


@register("j7_binned_lookup_2d", oracle=_J7_ORACLE, tags=("J7",))
def j7_binned_lookup_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned lookup join (muon ID/Iso/Trig SF by (pt, |eta|),
    lepton_sf.py:79-146): equi-join on both bucket indices, lookup
    broadcast."""
    li = table(spark, sf_dir, "lineitem")
    lk = spark.createDataFrame(
        [(i, j, w) for (i, j), w in sorted(_SF_2D.items())],
        "x_bin long, y_bin long, sf double",
    )
    joined = binned_lookup_join_2d(
        li,
        lk,
        F.col("l_quantity"),
        (1.0, 10.0, 5),
        F.col("l_extendedprice"),
        (0.0, 27500.0, 4),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        exact_sum(F.col("sf"), 6).alias("sf_sum"),
    )


# piecewise-linear NNLOPS-style reweight (nnlops.py:25-49)
_INTERP_XS = [0.0, 50000.0, 100000.0, 200000.0, 400000.0, 600000.0]
_INTERP_YS = [0.8731, 0.9412, 1.0523, 1.1247, 0.9156, 0.8419]

_J8_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       {exact_sum_sql(interp1d_sql("o_totalprice", _INTERP_XS, _INTERP_YS), 6)} AS w_sum
FROM orders
GROUP BY o_orderpriority
"""


@register("j8_interp_piecewise", oracle=_J8_ORACLE, tags=("J8",))
def j8_interp_piecewise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.interp as clamped piecewise-linear expression (NNLOPS reweight,
    nnlops.py:25-59).  For a handful of nodes the CASE chain beats any
    join — zero shuffle, full codegen; the SQL twin is generated from the
    same node list so arithmetic is bit-identical."""
    orders = table(spark, sf_dir, "orders")
    w = interp1d_expr(F.col("o_totalprice"), _INTERP_XS, _INTERP_YS)
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        exact_sum(w, 6).alias("w_sum"),
    )


# b-tag-style SF product (J10 + A2). SF values are powers of two on
# purpose: products of powers of two are exact in IEEE double and
# order-independent, so Spark's sorted fold and DuckDB's product() agree
# bit-for-bit. (With arbitrary decimals a product is only reproducible to
# ulps — the operator is identical, the fixture is chosen adversarially.)
_POW2_SF = [1.0, 0.5, 2.0, 0.25, 4.0]

_J10_ORACLE = f"""
WITH per_item AS (
  SELECT l_orderkey,
         CASE WHEN l_linenumber % 2 = 0 THEN -1 ELSE 1 END AS charge,
         CAST(CASE LEAST(GREATEST(CAST(FLOOR((l_quantity - 1.0) / 10.0) AS BIGINT), 0), 4)
              WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 2.0
              WHEN 3 THEN 0.25 ELSE 4.0 END AS DOUBLE) AS sf
  FROM lineitem
)
SELECT l_orderkey AS order_id,
       {sign_product_sql("charge")} AS charge_sign,
       PRODUCT(sf) AS sf_product
FROM per_item
GROUP BY l_orderkey
"""


@register("j10_sf_product", oracle=_J10_ORACLE, tags=("J10", "A2"))
def j10_sf_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-jet SF lookup then per-event product (btag_weights.py:4-61) +
    opposite-sign charge product (processor.py:260).  Product = JVM-side
    higher-order aggregate over the sorted multiset (no exp-log trick:
    survives zeros/negatives); charge sign = negative-count parity,
    exact integers."""
    li = table(spark, sf_dir, "lineitem")
    lk = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_POW2_SF)], "bin_idx long, sf double"
    )
    charge = F.when(F.col("l_linenumber") % 2 == 0, -1).otherwise(1)
    per_item = binned_lookup_join(
        li.withColumn("charge", charge), lk, F.col("l_quantity"), 1.0, 10.0, 5
    )
    return per_item.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        sign_product(F.col("charge")).alias("charge_sign"),
        product_agg(F.col("sf")).alias("sf_product"),
    )


@register(
    "j12_footprint_correction",
    oracle=f"""
SELECT o.o_orderkey,
       COALESCE(fp.n_near, 0) AS n_near,
       o.o_totalprice - COALESCE(fp.near_sum, 0.0) AS corrected_total
FROM orders o
LEFT JOIN (
  SELECT l_orderkey,
         COUNT(*) AS n_near,
         {exact_sum_sql("l_extendedprice")} AS near_sum
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
  GROUP BY l_orderkey
) fp ON fp.l_orderkey = o.o_orderkey
""",
    tags=("J12",),
)
def j12_footprint_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DR-footprint semi-join + corrective aggregate (soft-jet footprint
    subtracted from event HT, jets.py:247-289): items within a proximity
    window of their order's date are summed per order and subtracted from
    the order total.  Equi-join on the event key keeps it linear; the
    proximity predicate is a post-join filter, not a nested loop."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    near = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        )
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_near_raw"),
            exact_sum(F.col("l_extendedprice")).alias("near_sum_raw"),
        )
    )
    return orders.join(near, orders.o_orderkey == near.l_orderkey, "left").select(
        "o_orderkey",
        F.coalesce(F.col("n_near_raw"), F.lit(0)).alias("n_near"),
        (F.col("o_totalprice") - F.coalesce(F.col("near_sum_raw"), F.lit(0.0))).alias(
            "corrected_total"
        ),
    )


# certified-range mask (LumiMask, processor.py:146-148)
_MASK_RANGES = [(5, 120), (300, 450), (1000, 1500), (2500, 2600), (4000, 5000)]

_P4_VALUES = ", ".join(f"({lo}, {hi})" for lo, hi in _MASK_RANGES)


@register(
    "p4_interval_mask",
    oracle=f"""
SELECT event_type, COUNT(*) AS n
FROM events e
WHERE EXISTS (
  SELECT 1 FROM (VALUES {_P4_VALUES}) AS m(lo, hi)
  WHERE e.user_id >= m.lo AND e.user_id <= m.hi
)
GROUP BY event_type
""",
    tags=("P4",),
)
def p4_interval_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-membership filter (lumi mask: keep (run, lumi) inside
    certified ranges, processor.py:146-148).  The certified-range list is
    static driver-side config, so it compiles to an OR-of-BETWEEN
    predicate that Catalyst pushes into the parquet scan (PushedFilters)
    — no join at all.  A mask too large to compile (thousands of ranges)
    instead takes the bucketed range join (operators/rangejoin.py,
    `range_join_bucketed`), which stays a hash join."""
    ev = table(spark, sf_dir, "events")
    in_mask = None
    for lo, hi in _MASK_RANGES:
        cond = ev.user_id.between(lo, hi)
        in_mask = cond if in_mask is None else (in_mask | cond)
    return ev.filter(in_mask).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "f5_weights_ledger",
    oracle=f"""
SELECT l_returnflag,
       {exact_sum_sql("(1 - l_discount) * (1 + l_tax)", 6)} AS wgt_nominal_sum,
       {exact_sum_sql("(1 - 0.5 * l_discount) * (1 + l_tax)", 6)} AS wgt_disc_up_sum,
       {exact_sum_sql("(1 - 1.5 * l_discount) * (1 + l_tax)", 6)} AS wgt_disc_down_sum
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("F5",),
)
def f5_weights_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight ledger (Weights accumulator, weights.py:5-71): running
    nominal product + up/down variants where exactly one factor is
    replaced.  Pure column arithmetic — no UDF, no extra pass."""
    li = table(spark, sf_dir, "lineitem")
    ledger = (
        WeightsLedger()
        .add_weight_with_variations(
            "disc",
            1 - F.col("l_discount"),
            1 - F.lit(0.5) * F.col("l_discount"),
            1 - F.lit(1.5) * F.col("l_discount"),
        )
        .add_weight("tax", 1 + F.col("l_tax"))
    )
    with_wgts = ledger.with_columns(li)
    return with_wgts.groupBy("l_returnflag").agg(
        exact_sum(F.col("wgt_nominal"), 6).alias("wgt_nominal_sum"),
        exact_sum(F.col("wgt_disc_up"), 6).alias("wgt_disc_up_sum"),
        exact_sum(F.col("wgt_disc_down"), 6).alias("wgt_disc_down_sum"),
    )


@register(
    "asof_last_purchase",
    oracle="""
SELECT c.event_id,
       c.user_id,
       (SELECT MAX(p.ts) FROM events p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND p.ts <= c.ts) AS matched_ts
FROM events c
WHERE c.event_type = 'click'
""",
    tags=("J8", "asof"),
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each click, the most recent purchase by
    the same user at or before it.  Union + running-window pattern
    (operators/asof.py): one shuffle, one per-key sort, linear — the
    scalable alternative to a range join."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join_backward(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts"
    )
    return out.select("event_id", "user_id", F.col("matched_ts"))
