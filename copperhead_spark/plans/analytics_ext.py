"""Analytic-surface extensions: grouping sets / cube (the semantic form
of the reference's region x channel x variation fill loops, SURVEY.md
§2.4 note), pivot/unpivot, JSON extraction, SQL-API parity, and the
approximate aggregates used at 100 TB scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# documented error bounds asserted by approx_aggregates: HLL++ at the
# default rsd=0.05 must land within 2*rsd of the exact distinct count;
# percentile_approx(accuracy=10000) guarantees rank error <= 1/accuracy
# (relaxed 2x to keep the boundary integer arithmetic slack-free)
_APX_DISTINCT_RTOL = 0.10
_APX_RANK_EPS = 2.0e-4


@register(
    "approx_aggregates",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(DISTINCT l_partkey) AS n_distinct_exact,
       CAST(1 AS BIGINT) AS approx_distinct_ok,
       CAST(1 AS BIGINT) AS approx_median_ok
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("approx", "A8"),
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates with ORACLE-CHECKED error bounds: the
    sketch values themselves (HLL++ distinct, KLL-style median) are
    engine-specific, so the query emits integer pass/fail flags against
    documented bounds computed from EXACT values in the same plan — the
    HLL estimate within {_APX_DISTINCT_RTOL:.0%} of the exact distinct
    count, and the approximate median's exact rank within
    n*(0.5 +/- {_APX_RANK_EPS}).  The oracle computes the exact columns
    and asserts the flags are 1, so a sketch drifting out of contract
    hash-fails the gate instead of hiding behind a rows-only check."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("n_distinct_exact"),
        F.approx_count_distinct("l_partkey").alias("_apx_distinct"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_apx_median"),
    )
    ranked = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(g), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.first("n_distinct_exact").alias("n_distinct_exact"),
            F.first("_apx_distinct").alias("_apx_distinct"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("_apx_median")).cast("long")
            ).alias("_rank_le"),
            F.sum(
                (F.col("l_extendedprice") < F.col("_apx_median")).cast("long")
            ).alias("_rank_lt"),
        )
    )
    return ranked.select(
        "l_returnflag",
        "n",
        "n_distinct_exact",
        (
            F.abs(F.col("_apx_distinct") - F.col("n_distinct_exact"))
            <= F.lit(_APX_DISTINCT_RTOL) * F.col("n_distinct_exact")
        )
        .cast("long")
        .alias("approx_distinct_ok"),
        (
            (F.col("_rank_le") >= (F.lit(0.5 - _APX_RANK_EPS) * F.col("n")))
            & (F.col("_rank_lt") <= (F.lit(0.5 + _APX_RANK_EPS) * F.col("n")))
        )
        .cast("long")
        .alias("approx_median_ok"),
    )


@register(
    "a14_corr_covar",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM m GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS corr_qty_price,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_pop_qty_price
FROM s
""",
    tags=("A14", "statistics"),
)
def a14_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance of quantity vs price
    per return flag, via EXACT integer moment sums (n, Σx, Σy, Σxy,
    Σx², Σy² as BIGINT — associative, order-free) with the float
    division/sqrt done once on the tiny per-group row: bit-deterministic
    where built-in corr()/covar_pop() drift with partition order.
    The moment sums themselves stay exact int64 (y ~ 1.05e5 so y² ~
    1.1e10/row — Σy² fits ~8e8 rows per group; raise the price unit
    for bigger groups); the per-group combine runs in DOUBLE so no
    n*Σy² int64 product can overflow.  Scale: one partial-agg shuffle, six longs per
    group in flight."""
    li = table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    # final scalar math entirely in DOUBLE: the moment SUMS stay exact
    # int64, but n*syy would overflow int64 near ~29k rows/group (y^2 is
    # ~1.1e10), so the per-group combination converts each factor first —
    # identical IEEE ops on identical integers on both engines, still
    # bit-deterministic
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    denx = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
    deny = F.sqrt(d("n") * d("syy") - d("sy") * d("sy"))
    return s.select(
        "l_returnflag",
        "n",
        (num / (denx * deny)).alias("corr_qty_price"),
        (num / (d("n") * d("n"))).alias("covar_pop_qty_price"),
    )


@register(
    "a15_grouped_array_agg",
    oracle="""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       array_to_string(list_sort(list(o_orderkey))[1:5], ',') AS first_orders
FROM orders
GROUP BY o_custkey
""",
    tags=("A15", "arrays"),
)
def a15_grouped_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ARRAY aggregation (collect -> sort -> slice): each
    customer's first five order keys — the nested-result shape feature
    stores and API layers consume directly instead of re-grouping rows.
    sort_array pins element order, so the value is deterministic under
    any partitioning (collect_list alone is not — the classic
    silent-flake).  The driver-facing result serializes the array with
    array_join (the driver's canonicalizer cannot hash raw ARRAY
    columns — CORRECTNESS_r04); the array-native form stays covered by
    tests/test_round5_regressions.py::test_a15_array_native_twin.
    Scale: one partial-agg exchange; the slice caps per-group payload so
    a hot key cannot balloon a row."""
    return _a15_array_native(spark, sf_dir).select(
        "o_custkey",
        "n_orders",
        F.array_join(F.col("first_orders").cast("array<string>"), ",").alias(
            "first_orders"
        ),
    )


def _a15_array_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-native twin of a15 (local tests only — raw ARRAY output is
    not driver-hashable)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.slice(F.sort_array(F.collect_list("o_orderkey")), 1, 5).alias(
            "first_orders"
        ),
    )


@register(
    "p13_scalar_subquery",
    oracle="""
SELECT p_type,
       CAST(COUNT(*) AS BIGINT) AS n_above_avg
FROM part
WHERE p_retailprice > (SELECT CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 100.0) FROM part)
GROUP BY p_type
""",
    tags=("P13", "sql"),
)
def p13_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery SQL surface: parts priced above the global
    average, counted per type — spark.sql text with an uncorrelated
    scalar subquery, which Catalyst plans as a one-row subquery
    broadcast into the filter (no join in the user's plan).  The average
    is the exact fixed-point form (integer-cent sum / count): a plain
    AVG(double) is partition-order dependent, and a price within ulps of
    the threshold could flip the row set between engines.  Scale: the subquery is a full-reduction
    (tiny); the outer scan filters map-side against its literal
    result."""
    register_views(spark, sf_dir, names=("part",))
    return spark.sql(
        """
        SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_above_avg
        FROM part
        WHERE p_retailprice > (SELECT CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 100.0) FROM part)
        GROUP BY p_type
        """
    )


@register(
    "a18_weighted_median",
    oracle="""
WITH wv AS (
  SELECT l_returnflag, l_quantity AS v,
         SUM(CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS total
  FROM wv
)
SELECT l_returnflag,
       CAST(total AS BIGINT) AS total_w_e2,
       CAST(MIN(CASE WHEN cum * 2 >= total THEN v END) AS DOUBLE)
         AS weighted_median
FROM c
GROUP BY l_returnflag, total
""",
    tags=("A18", "statistics"),
)
def a18_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (weighted order statistic): the smallest quantity
    whose cumulative weight reaches half the group's total, with weights
    = integer-cent (1 - discount) — revenue-weighted rather than
    row-weighted central tendency, which percentile()/a8 cannot express.
    Entirely exact: integer weights, integer cumulative sums, and the
    crossing rule cum*2 >= total avoids any half-total division.  Scale:
    the raw fact collapses in ONE groupBy to at most |groups| x
    |distinct values| rows (150 here); the window and crossing scan run
    on that tiny table — the same collapse-then-window discipline as
    events_spike_detection."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    w_e2 = F.round((1 - F.col("l_discount")) * 100).cast("long")
    wv = li.groupBy(
        "l_returnflag", F.col("l_quantity").alias("v")
    ).agg(F.sum(w_e2).alias("w"))
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    c = wv.select(
        "l_returnflag",
        "v",
        F.sum("w").over(win).alias("cum"),
        F.sum("w").over(tot).alias("total"),
    )
    return (
        c.groupBy("l_returnflag", "total")
        .agg(
            F.min(F.when(F.col("cum") * 2 >= F.col("total"), F.col("v")))
            .cast("double")
            .alias("weighted_median")
        )
        .select(
            "l_returnflag",
            F.col("total").cast("long").alias("total_w_e2"),
            "weighted_median",
        )
    )


@register(
    "sql_recursive_date_spine",
    oracle=f"""
WITH RECURSIVE spine(m) AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
  WHERE m < (SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) FROM orders)
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n,
         {exact_sum_sql("o_totalprice")} AS total
  FROM orders GROUP BY 1
)
SELECT s.m AS month_start,
       CAST(COALESCE(mo.n, 0) AS BIGINT) AS n_orders,
       COALESCE(mo.total, 0.0) AS month_total
FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
""",
    tags=("sql", "recursive", "T5"),
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE surface (Spark 4's WITH RECURSIVE): generate the
    complete month spine between the corpus's first and last order month
    — one row per month whether or not any order landed in it — and
    LEFT JOIN the monthly rollup onto it, so empty months surface as
    explicit zeros instead of silently missing rows (the
    calendar-completeness property every reporting pipeline needs, and
    the one a plain GROUP BY cannot provide).  The recursion is
    |months|-deep on a single-row frontier — driver-bounded work; the
    data-touching parts (bounds aggregate, monthly rollup) stay
    ordinary distributed aggregates.  Both engines run structurally
    identical recursive SQL (Spark: add_months; DuckDB: + INTERVAL)."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        f"""
WITH RECURSIVE spine(m) AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) FROM orders
  UNION ALL
  SELECT add_months(m, 1) FROM spine
  WHERE m < (SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) FROM orders)
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         COUNT(*) AS n,
         {{exact}} AS total
  FROM orders GROUP BY 1
)
SELECT s.m AS month_start,
       CAST(COALESCE(mo.n, 0) AS BIGINT) AS n_orders,
       COALESCE(mo.total, CAST(0.0 AS DOUBLE)) AS month_total
FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
""".format(exact=exact_sum_sql("o_totalprice"))
    )


@register(
    "a19_rollup_hierarchy",
    oracle=f"""
SELECT COALESCE(r_name, '<all>') AS region,
       COALESCE(n_name, '<all>') AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {exact_sum_sql("o_totalprice")} AS revenue
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("A6", "rollup"),
)
def a19_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP along the region > nation hierarchy: grand total, per-region
    subtotal, per-nation detail from ONE shuffle (Spark expands grouping
    sets map-side, so the fact table is scanned and partially aggregated
    once — the reference recomputes each rollup level as a separate
    groupby pass, plotting.py summation loops).  nation+region are
    broadcast dims; the only exchange is the customer equi-join and the
    grouping-set aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "a20_filtered_aggregates",
    oracle=f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
       {exact_sum_sql("CASE WHEN l_quantity > 25 THEN l_extendedprice END")} AS bulk_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("A6", "filter-agg"),
)
def a20_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates: several differently-predicated aggregates
    out of one scan + one exchange (the reference's per-region yield
    variants each re-filter the full table).  Spark's conditional-agg
    form (count(when...), sum(when...)) compiles to the same partial
    aggregate as SQL FILTER — no extra pass per predicate."""
    li = table(spark, sf_dir, "lineitem")
    bulk = F.col("l_quantity") > 25
    disc = F.col("l_discount") > 0.05
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(bulk, 1)).alias("n_bulk"),
        F.count(F.when(disc, 1)).alias("n_discounted"),
        exact_sum(F.when(bulk, F.col("l_extendedprice"))).alias("bulk_price"),
    )


@register(
    "j18_lateral_topk_per_nation",
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal, CAST(t.rk AS BIGINT) AS rank
FROM nation n
CROSS JOIN LATERAL (
  SELECT c_custkey, c_acctbal,
         ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 2
) t
""",
    tags=("J18", "lateral"),
)
def j18_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-k (top-2 customers by balance per nation).
    The lateral form re-executes the subquery per outer row — fine on a
    25-row dim, quadratic poison against a big outer.  The Spark plan is
    the scale-correct de-correlation: ONE window rank over the fact side
    partitioned by the join key, then a broadcast join back to the dim —
    identical semantics, one shuffle regardless of outer cardinality."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    top = (
        c.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 2)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rank")
    )
    return top.join(F.broadcast(n), top.c_nationkey == n.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal", "rank"
    )


# ---------------------------------------------------------------------------
# chi-square independence audit (contingency table, exact fixed point)
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS flag, l_linestatus AS status,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM lineitem GROUP BY 1, 2
),
m AS (
  SELECT *,
         CAST(SUM(o) OVER (PARTITION BY flag) AS BIGINT) AS rt,
         CAST(SUM(o) OVER (PARTITION BY status) AS BIGINT) AS ct,
         CAST(SUM(o) OVER () AS BIGINT) AS n,
         CAST(COUNT(*) OVER (PARTITION BY flag) AS BIGINT) AS r_cells,
         CAST(COUNT(*) OVER (PARTITION BY status) AS BIGINT) AS c_cells
  FROM cells
),
x AS (
  SELECT flag, status, o, rt, ct, n, r_cells, c_cells,
         CAST((rt * ct * 100) // n AS BIGINT) AS e_e2,
         CAST(((CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
               * (CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
               * 1000000)
              // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT) AS cell_chi2_e6
  FROM m
)
SELECT flag, status, o, e_e2, cell_chi2_e6,
       CAST(SUM(cell_chi2_e6) OVER () AS BIGINT) AS chi2_e6,
       CAST((MAX(r_cells) OVER () - 1) * (MAX(c_cells) OVER () - 1) AS BIGINT)
         AS dof
FROM x ORDER BY flag, status
"""


@register("dq_chi2_independence", oracle=_CHI2_ORACLE, tags=("statistics", "dq"))
def dq_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of two categoricals (return flag x
    line status): per-cell observed vs expected counts and the exact
    1e-6 fixed-point chi-square statistic chi2 = sum (O*n - rt*ct)^2 /
    (n*rt*ct), plus degrees of freedom — the data-quality test for
    'did this column become correlated with that one after the last
    ingest'.  The squared numerator exceeds int64 (~1.3e19 at sf0.01),
    so the cell statistic runs in DECIMAL(38,0) on Spark and HUGEINT on
    DuckDB — value-identical 128-bit integer paths (fits up to ~3e6-row
    marginals; normalize counts first beyond that).

    Scale design: one partial-agg shuffle collapses the fact table to
    |flag| x |status| cells; every window after that (marginals, total,
    dof) runs over those few cells.  The audit is metadata-sized at any
    corpus size — the canonical histogram-then-test shape shared with
    ml_decision_stump.

    Reference analogue: fin1_chi2_model_selection applies chi-square to
    fit residuals; this is the categorical-independence form over raw
    data."""
    li = table(spark, sf_dir, "lineitem")
    cells = (
        li.selectExpr("l_returnflag AS flag", "l_linestatus AS status")
        .groupBy("flag", "status")
        .agg(F.count("*").cast("long").alias("o"))
    )
    wf = Window.partitionBy("flag")
    ws = Window.partitionBy("status")
    wa = Window.partitionBy()
    m = cells.select(
        "flag",
        "status",
        "o",
        F.sum("o").over(wf).cast("long").alias("rt"),
        F.sum("o").over(ws).cast("long").alias("ct"),
        F.sum("o").over(wa).cast("long").alias("n"),
        F.count("*").over(wf).cast("long").alias("r_cells"),
        F.count("*").over(ws).cast("long").alias("c_cells"),
    )
    x = m.selectExpr(
        "flag",
        "status",
        "o",
        "rt",
        "ct",
        "n",
        "r_cells",
        "c_cells",
        "CAST((rt * ct * 100) DIV n AS BIGINT) AS e_e2",
        "CAST(((CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)"
        " * (CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)"
        " * 1000000)"
        " DIV (CAST(n AS DECIMAL(38,0)) * rt * ct) AS BIGINT) AS cell_chi2_e6",
    )
    return x.select(
        "flag",
        "status",
        "o",
        "e_e2",
        "cell_chi2_e6",
        F.sum("cell_chi2_e6").over(wa).cast("long").alias("chi2_e6"),
        ((F.max("r_cells").over(wa) - 1) * (F.max("c_cells").over(wa) - 1))
        .cast("long")
        .alias("dof"),
    ).orderBy("flag", "status")


# ---------------------------------------------------------------------------
# exact P99 without a full sort: histogram bin + in-bin order statistic
# ---------------------------------------------------------------------------

_P99_BIN = 100_000  # $1000 bins over price cents
_P99_Q_NUM, _P99_Q_DEN = 99, 100

_P99_ORACLE = f"""
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
),
r AS (
  SELECT flag, price_c,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY price_c) AS rn,
         COUNT(*) OVER (PARTITION BY flag) AS n
  FROM v
)
SELECT flag, CAST(MIN(n) AS BIGINT) AS n,
       CAST(MIN(({_P99_Q_NUM} * n + {_P99_Q_DEN} - 1) // {_P99_Q_DEN}) AS BIGINT)
         AS k,
       CAST(MIN(CASE WHEN rn = ({_P99_Q_NUM} * n + {_P99_Q_DEN} - 1)
                               // {_P99_Q_DEN}
                THEN price_c END) AS BIGINT) AS p99_c
FROM r GROUP BY flag ORDER BY flag
"""


@register("a21_two_phase_p99", oracle=_P99_ORACLE, tags=("A8", "quantiles"))
def a21_two_phase_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT P99 (the k = ceil(0.99n) order statistic) per group without
    ever sorting the data: phase 1 histograms values into $1000 bins and
    walks the cumulative counts to find the one bin containing position
    k; phase 2 sorts ONLY that bin's rows (a broadcast semi-join
    selects them) and picks the (k - rows_before)-th.  The oracle is
    the brute-force ROW_NUMBER order statistic, so the two-phase plan
    is proven value-identical — including under ties at bin borders.

    Scale design: this is how exact percentiles are computed at 100 TB
    (approx_percentile bounds the bin; here the bound comes from the
    exact histogram): one partial-agg shuffle for the histogram, window
    walks over |bins| cells, then a second pass that sorts ~n/|bins|
    rows per group instead of n.  The full-sort plan (a8_quantiles)
    exists as the semantics; this is the plan you run when the sort
    won't fit.

    Reference analogue: A8/A10's quantile machinery with the
    sort-avoidance strategy the reference never needed (its arrays fit
    in memory)."""
    li = table(spark, sf_dir, "lineitem")
    v = li.selectExpr(
        "l_returnflag AS flag",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c",
    )
    h = (
        v.withColumn("bin", F.expr(f"price_c DIV {_P99_BIN}"))
        .groupBy("flag", "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wb = (
        Window.partitionBy("flag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h.select(
        "flag",
        "bin",
        (F.sum("c").over(wb) - F.col("c")).alias("before"),
        F.sum("c").over(wb).alias("cum"),
        F.sum("c").over(Window.partitionBy("flag")).cast("long").alias("n"),
    ).withColumn(
        "k",
        F.expr(
            f"CAST(({_P99_Q_NUM} * n + {_P99_Q_DEN} - 1) DIV {_P99_Q_DEN} AS BIGINT)"
        ),
    )
    target = (
        cum.filter((F.col("cum") >= F.col("k")) & (F.col("before") < F.col("k")))
        .select("flag", "bin", "before", "n", "k")
    )
    inbin = v.withColumn("bin", F.expr(f"price_c DIV {_P99_BIN}")).join(
        F.broadcast(target), ["flag", "bin"]
    )
    wr = Window.partitionBy("flag").orderBy("price_c")
    return (
        inbin.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == F.col("k") - F.col("before"))
        .selectExpr("flag", "n", "k", "price_c AS p99_c")
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# exact GLOBAL deciles without a global sort: the two-phase histogram +
# in-bin order-statistic pattern (a21), generalized to all nine NTILE
# cut points at once — the 100 TB twin of w6_ntile_deciles' caveat.
# ---------------------------------------------------------------------------

_DEC_BIN = 16  # n_chars bin width; ~35 bins over the documents range

_DECILES_ORACLE = f"""
WITH r AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
),
ds AS (SELECT unnest(range(1, 10)) AS d)
SELECT CAST(d AS BIGINT) AS decile,
       CAST(d * (n // 10) + LEAST(d, n % 10) AS BIGINT) AS k,
       v AS boundary_chars,
       doc_id AS boundary_doc
FROM r JOIN ds ON rn = d * (n // 10) + LEAST(d, n % 10)
ORDER BY decile
"""


@register("a22_two_phase_deciles", oracle=_DECILES_ORACLE, tags=("A8", "W6", "quantiles"))
def a22_two_phase_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global decile boundaries (the nine NTILE(10) cut points —
    order statistics at k_d = d*(n div 10) + least(d, n mod 10)) without
    any global sort: the registered scale twin that retires
    w6_ntile_deciles' documented caveat (NTILE needs its whole partition
    ordered, which a global NTILE cannot have at 100 TB).  Phase 1
    histograms values into {_DEC_BIN}-wide bins (one partial-agg
    shuffle), walks the |bins|-sized cumulative frame, and each bin row
    EMITS the deciles it contains via a filtered-sequence explode — nine
    constants derived map-side, no constant-key join, no BNLJ.  Phase 2
    broadcast-joins the up-to-nine candidate bins back to the rows and
    ranks only ~n/|bins| rows per (bin, decile).  The oracle is the
    brute-force ROW_NUMBER order statistic, so the two-phase plan is
    proven value-identical, including ties at bin borders (total order
    by (n_chars, doc_id) on both engines)."""
    docs = table(spark, sf_dir, "documents")
    v = docs.selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS v")
    h = (
        v.withColumn("bin", F.expr(f"v DIV {_DEC_BIN}"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = h.select(
        "bin",
        (F.sum("c").over(wb) - F.col("c")).alias("before"),
        F.sum("c").over(wb).alias("cum"),
        F.sum("c").over(wn).cast("long").alias("n"),
    )
    k_of = "d * (n DIV 10) + least(d, n % 10)"
    cand = (
        cum.select(
            "bin",
            "before",
            "n",
            F.explode(
                F.expr(
                    f"filter(sequence(1, 9),"
                    f" d -> before < {k_of} AND {k_of} <= cum)"
                )
            ).alias("d"),
        )
        .withColumn("k", F.expr(f"CAST({k_of} AS BIGINT)"))
    )
    inbin = v.withColumn("bin", F.expr(f"v DIV {_DEC_BIN}")).join(
        F.broadcast(cand), "bin"
    )
    wr = Window.partitionBy("bin", "d").orderBy("v", "doc_id")
    return (
        inbin.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == F.col("k") - F.col("before"))
        .selectExpr(
            "CAST(d AS BIGINT) AS decile",
            "k",
            "v AS boundary_chars",
            "doc_id AS boundary_doc",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (the privacy gate training corpora with user-derived
# rows must pass before release): any quasi-identifier combination
# shared by fewer than K individuals re-identifies them.
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    "dq_k_anonymity",
    oracle=f"""
WITH g AS (
  SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT CAST({_KANON_K} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE n < {_KANON_K}) AS BIGINT) AS n_small_groups,
       CAST(COALESCE(SUM(n) FILTER (WHERE n < {_KANON_K}), 0) AS BIGINT)
         AS n_risky_rows,
       CAST(MIN(n) AS BIGINT) AS min_group_size
FROM g
""",
    tags=("dq", "privacy"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (mktsegment, nationkey) quasi-
    identifier pair: how many equivalence classes exist, how many fall
    below k={_KANON_K}, and how many rows those classes expose — the
    go/no-go numbers a privacy review reads before a dataset ships.
    One partial-agg groupBy on the quasi-identifier (bounded key space),
    then a scalar rollup; the base table is scanned once and only the
    two audited columns are read (column pruning)."""
    cust = table(spark, sf_dir, "customer")
    g = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n")
    )
    small = F.col("n") < _KANON_K
    return g.agg(
        F.lit(_KANON_K).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_groups"),
        F.count_if(small).cast("long").alias("n_small_groups"),
        F.coalesce(F.sum(F.when(small, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("n").cast("long").alias("min_group_size"),
    )


# ---------------------------------------------------------------------------
# generic column profiler (the DQ pass every lake runs on ingest):
# null count / distinct count / min / max per column, one scan.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_s,
       CAST(MAX({c}) AS VARCHAR) AS max_s
FROM lineitem""")
    return " UNION ALL ".join(parts)


@register("dq_column_profile", oracle=_profile_oracle(), tags=("dq",))
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column ingest profile (rows / nulls / exact distinct / min /
    max, stringified for a type-uniform audit row) over a representative
    column set.  ONE scan: all per-column aggregates run in a single
    global agg (Spark plans multi-distinct via expand — one pass over
    the data, |columns| expanded rows per input row), then the 1-row
    wide result unpivots via stack into the audit shape.  The oracle
    computes each column's profile independently (UNION ALL of scalar
    scans) — a genuinely different plan shape, so agreement pins the
    expand/unpivot rewrite, not the arithmetic.

    Floats stringify via the engines' float-repr: both sides print
    shortest-roundtrip doubles for these value ranges (pinned by the
    driver hash)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(c)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, n_nulls, n_distinct, min_s, max_s)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


# ---------------------------------------------------------------------------
# referential-integrity audit: orphan foreign keys per relationship —
# the lakehouse constraint check engines without enforced FKs must run.
# ---------------------------------------------------------------------------

_RI_RELS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
)


def _ri_oracle() -> str:
    parts = []
    for name, child, ck, parent, pk in _RI_RELS:
        parts.append(f"""
SELECT '{name}' AS relationship,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
       CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
       CAST(COUNT(DISTINCT c.{ck}) AS BIGINT) AS n_orphan_keys,
       CAST(COALESCE(SUM(DISTINCT c.{ck}), 0) AS BIGINT) AS orphan_key_checksum
FROM {child} c
WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})""")
    return " UNION ALL ".join(parts)


@register("dq_referential_integrity", oracle=_ri_oracle(), tags=("dq",))
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-FK audit over three parent/child relationships (including
    one that genuinely fires: events.user_id has no enforced FK into
    customer): per relationship the child row count, orphan rows,
    distinct orphan keys, and a key checksum pinning the exact orphan
    SET.  Spark side: per relationship, one LEFT ANTI join of the child
    KEY PROJECTION against the parent key projection — at 100 TB the
    parent key set broadcasts (or graduates to a bloom prefilter,
    bloom_semijoin_reduction's pattern); the child table is scanned
    once per relationship with only the key column read."""
    out = None
    for name, child, ck, parent, pk in _RI_RELS:
        c = table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        n_child = c.count()
        orphans = c.join(F.broadcast(p), "k", "left_anti")
        row = orphans.agg(
            F.lit(name).alias("relationship"),
            F.lit(n_child).cast("long").alias("n_child_rows"),
            F.count("*").cast("long").alias("n_orphan_rows"),
            F.countDistinct("k").cast("long").alias("n_orphan_keys"),
            F.coalesce(F.sum_distinct(F.col("k")), F.lit(0))
            .cast("long")
            .alias("orphan_key_checksum"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# l-diversity audit (k-anonymity's companion): a quasi-identifier group
# is risky if its SENSITIVE attribute takes too few distinct values,
# even when the group itself is large.
# ---------------------------------------------------------------------------

_LDIV_L = 3


@register(
    "dq_l_diversity",
    oracle=f"""
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
           AS BIGINT) AS n_sensitive
  FROM customer GROUP BY 1, 2
)
SELECT CAST({_LDIV_L} AS BIGINT) AS l,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE n_sensitive < {_LDIV_L}) AS BIGINT)
         AS n_low_diversity,
       CAST(COALESCE(SUM(n) FILTER (WHERE n_sensitive < {_LDIV_L}), 0)
         AS BIGINT) AS n_risky_rows,
       CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity
FROM g
""",
    tags=("dq", "privacy"),
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: per (mktsegment, nationkey) quasi-identifier
    group, the distinct count of the sensitive attribute (account
    balance in 1000-unit buckets — floor of a ratio of exact decimals,
    engine-portable); groups with fewer than l={_LDIV_L} distinct
    sensitive values leak the attribute even when k-anonymous.  Same
    single-groupBy shape as dq_k_anonymity — the two audits share one
    shuffle in a combined run."""
    cust = table(spark, sf_dir, "customer")
    g = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n"),
        F.countDistinct(
            F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)")
        ).alias("n_sensitive"),
    )
    low = F.col("n_sensitive") < _LDIV_L
    return g.agg(
        F.lit(_LDIV_L).cast("long").alias("l"),
        F.count("*").cast("long").alias("n_groups"),
        F.count_if(low).cast("long").alias("n_low_diversity"),
        F.coalesce(F.sum(F.when(low, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
    )


# ---------------------------------------------------------------------------
# pseudonymization with referential consistency (the GDPR-pipeline
# transform): replace the customer key everywhere with a keyed bijection
# and PROVE joins still line up.  pseud(k) = (k%P * A + SALT*B) % P is an
# affine map mod a prime — a bijection on [0, P), so distinct keys stay
# distinct and equijoins are preserved exactly.
# ---------------------------------------------------------------------------

_PSE_P = 2_147_483_647
_PSE_SALT = 6_700_417


def _pseud(col: str) -> str:
    # the salt offset is pre-multiplied in Python: SALT * 1664525 as two
    # int literals overflows Spark's ANSI INT multiply (a single big
    # literal parses as BIGINT on both engines)
    return (
        f"(((CAST({col} AS BIGINT) % {_PSE_P}) * 1013904223"
        f" + {_PSE_SALT * 1664525}) % {_PSE_P} + {_PSE_P}) % {_PSE_P}"
    )


@register(
    "dq_pseudonymization",
    oracle=f"""
WITH mo AS (SELECT {_pseud("o_custkey")} AS pk, o_orderkey FROM orders),
mc AS (SELECT {_pseud("c_custkey")} AS pk FROM customer),
orig AS (
  SELECT COUNT(*) AS n_joined
  FROM orders JOIN customer ON o_custkey = c_custkey
),
masked AS (SELECT COUNT(*) AS n_joined_masked FROM mo JOIN mc USING (pk))
SELECT CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
         AS n_keys_orig,
       CAST((SELECT COUNT(DISTINCT pk) FROM mo) AS BIGINT) AS n_keys_masked,
       CAST((SELECT n_joined FROM orig) AS BIGINT) AS n_joined_orig,
       CAST((SELECT n_joined_masked FROM masked) AS BIGINT) AS n_joined_masked,
       CAST((SELECT SUM(pk) FROM mc) AS BIGINT) AS pseudonym_checksum
""",
    tags=("dq", "privacy"),
)
def dq_pseudonymization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization audit: the customer key is replaced in BOTH
    orders and customer by the same affine-mod-prime bijection (salted —
    rotate the salt to re-key a release), then the audit row proves the
    transform is analysis-preserving: distinct-key count unchanged
    (bijection ⇒ no collisions) and the orders⋈customer row count
    identical before and after masking.  The checksum pins the exact
    pseudonym set, so a salt or formula drift hash-fails.

    Plan shape: each audit metric is a 1-row aggregate; the five are
    UNIONed as (metric, value) rows and pivoted into the audit row —
    everything stays engine-side (no driver collects, no scalar cross
    joins), and the union's branches share the two scans.  Masking
    itself is a map-side expression — at 100 TB the audit costs the
    same equi-join the unmasked pipeline already runs."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    mo = orders.selectExpr(f"{_pseud('o_custkey')} AS pk", "o_orderkey")
    mc = cust.selectExpr(f"{_pseud('c_custkey')} AS pk")

    def metric(df, name, agg):
        return df.agg(agg.cast("long").alias("v")).selectExpr(
            f"'{name}' AS k", "v"
        )

    parts = (
        metric(orders.select("o_custkey").distinct(), "n_keys_orig", F.count("*"))
        .unionByName(
            metric(mo.select("pk").distinct(), "n_keys_masked", F.count("*"))
        )
        .unionByName(
            metric(
                orders.join(cust, orders.o_custkey == cust.c_custkey),
                "n_joined_orig",
                F.count("*"),
            )
        )
        .unionByName(metric(mo.join(mc, "pk"), "n_joined_masked", F.count("*")))
        .unionByName(metric(mc, "pseudonym_checksum", F.sum("pk")))
    )
    return (
        parts.groupBy()
        .pivot(
            "k",
            [
                "n_keys_orig",
                "n_keys_masked",
                "n_joined_orig",
                "n_joined_masked",
                "pseudonym_checksum",
            ],
        )
        .agg(F.first("v"))
        .selectExpr(
            "n_keys_orig",
            "n_keys_masked",
            "n_joined_orig",
            "n_joined_masked",
            "pseudonym_checksum",
        )
    )

# ---------------------------------------------------------------------------
# time-to-convert distribution: hours from a user's FIRST event to their
# FIRST purchase, bucketed — the latency histogram growth teams read
# next to the attribution table (events_attribution_first_last).
# ---------------------------------------------------------------------------

_TTC_HOUR_US = 3_600_000_000


@register(
    "events_time_to_convert",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS first_us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS conv_us
  FROM events GROUP BY user_id
)
SELECT (conv_us - first_us) // {_TTC_HOUR_US} AS hours_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(conv_us - first_us) AS BIGINT) AS min_us,
       CAST(MAX(conv_us - first_us) AS BIGINT) AS max_us
FROM u
WHERE conv_us IS NOT NULL
GROUP BY 1
""",
    tags=("events", "sessions", "A13"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram: per user, the gap from their first
    event of any type to their first 'purchase' (non-converters drop
    out), bucketed into whole hours with per-bucket user counts and
    exact min/max gaps.  Two partial-agg groupBys — (user) then (bucket)
    — and the conditional MIN folds the 'first purchase' lookup into the
    same pass as 'first event', so the events table is scanned ONCE and
    shuffles once on user_id (at 100 TB the second shuffle moves
    |users| rows, then |buckets|).  All arithmetic is integer epoch
    microseconds: no timezone, no float, bit-exact."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("conv_us"),
    )
    gap = F.col("conv_us") - F.col("first_us")
    return (
        u.filter(F.col("conv_us").isNotNull())
        .groupBy(F.expr(f"(conv_us - first_us) DIV {_TTC_HOUR_US}").alias("hours_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.min(gap).cast("long").alias("min_us"),
            F.max(gap).cast("long").alias("max_us"),
        )
    )


from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
