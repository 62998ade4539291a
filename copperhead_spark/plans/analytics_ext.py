"""Analytic-surface extensions: grouping sets / cube (the semantic form
of the reference's region x channel x variation fill loops, SURVEY.md
§2.4 note), pivot/unpivot, JSON extraction, SQL-API parity, and the
approximate aggregates used at 100 TB scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import register_views, table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register


@register(
    "a5_cube_grouping_sets",
    oracle=f"""
SELECT COALESCE(l_returnflag, '<all>') AS region,
       COALESCE(l_linestatus, '<all>') AS status,
       COUNT(*) AS n,
       {exact_sum_sql("l_quantity", 0)} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("A5", "cube"),
)
def a5_cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over categorical axes: the reference's nested region/channel/
    variation loops are semantically GROUP BY GROUPING SETS
    (histogrammer.py:56-66) — one shuffle computes every marginal."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), exact_sum(F.col("l_quantity"), 0).alias("sum_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("region"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("status"),
            "n",
            "sum_qty",
        )
    )


@register(
    "pivot_status_by_flag",
    oracle=f"""
SELECT l_returnflag,
       {exact_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_extendedprice END")} AS price_O,
       {exact_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_extendedprice END")} AS price_F
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("pivot",),
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-flag row, one column per line status (the MultiIndex
    (Variable, Variation) -> columns flattening pattern)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(exact_sum(F.col("l_extendedprice")))
        .withColumnRenamed("O", "price_O")
        .withColumnRenamed("F", "price_F")
    )


@register(
    "unpivot_variations",
    oracle=f"""
SELECT l_returnflag, variation, {exact_sum_sql("wgt", 6)} AS wgt_sum
FROM (
  SELECT l_returnflag, 'nominal' AS variation, (1 - l_discount) AS wgt FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'up' AS variation, (1 - 0.5 * l_discount) AS wgt FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'down' AS variation, (1 - 1.5 * l_discount) AS wgt FROM lineitem
)
GROUP BY 1, 2
""",
    tags=("pivot", "A5"),
)
def unpivot_variations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): systematic-variation columns melted into a
    variation axis, then aggregated in ONE shuffle — how stage-2 fans out
    wgt_* variations without a Python loop (histogrammer.py:56-120)."""
    li = table(spark, sf_dir, "lineitem")
    stacked = li.selectExpr(
        "l_returnflag",
        "stack(3, 'nominal', 1 - l_discount,"
        " 'up', 1 - 0.5 * l_discount,"
        " 'down', 1 - 1.5 * l_discount) AS (variation, wgt)",
    )
    return stacked.groupBy("l_returnflag", "variation").agg(
        exact_sum(F.col("wgt"), 6).alias("wgt_sum")
    )


@register(
    "json_extract_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
""",
    tags=("json",),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction (events.props) — the
    schema-on-read path for property bags.  get_json_object stays
    JVM-side; at scale prefer from_json with an explicit schema to parse
    once."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
    )


@register(
    "sql_api_region_revenue",
    oracle=f"""
SELECT r_name,
       COUNT(*) AS n,
       {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=("sql", "J1"),
)
def sql_api_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API surface: identical text runs through spark.sql over
    registered views (Catalyst produces the same plan as the DataFrame
    form — TPC-H Q5 shape)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT r_name,
               COUNT(*) AS n,
               {exact_sum_sql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register("approx_aggregates", oracle=None, tags=("approx", "A8"))
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB substitutes for exact distinct
    counts and quantiles (HLL++ / KLL-style sketches).  No cross-engine
    oracle exists for sketch internals, so this is a rows-only check;
    the exact twins (a1_count_per_group, a8_quantiles) are oracle-checked."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.count("*").alias("n"),
    )
