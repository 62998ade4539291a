"""Fixed-point PageRank over the customer–supplier interaction graph.

Graph analytics beyond the reference (its only graph-shaped op is the
overlap-removal set logic, python/postprocessor.py); connected
components already live in plans/dedup.py / operators/graph.py.  This
adds the other canonical iterative-propagation operator, PageRank, in a
form the DuckDB oracle can replay bit-exactly: all arithmetic is BIGINT
(ranks in micro-units, integer division for the out-degree split and the
damping), so partial-agg reordering can never change a result.

Scale design: the edge list is the big table; per iteration we do ONE
shuffle — join(ranks, src) then groupBy(dst) — and the rank table (one
row per node) is orders of magnitude smaller than edges.  At 100 TB the
edges are bucketed by src once, so every iteration's join co-locates and
only the groupBy(dst) exchanges data.  Iteration count is fixed (the
unrolled-CTE oracle mirrors it); convergence-driven stopping would use
the same loop with an AQE-observed delta metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.plans.registry import register

_ITERS = 3
_R0 = 1_000_000  # initial rank, micro-units
_TELEPORT = 150_000  # 0.15 in micro-units
_DAMP_NUM, _DAMP_DEN = 85, 100  # 0.85 damping as an exact ratio
_SUPP_BASE = 1_000_000  # node-id offset separating supplier from customer ids


def _edges_deg(spark: SparkSession, sf_dir: str):
    """Symmetrized customer<->supplier edge list + out-degrees.

    src/dst are BIGINT node ids: customers keep o_custkey, suppliers get
    l_suppkey + _SUPP_BASE.  Symmetrizing guarantees every node has
    out-degree >= 1 (no dangling-mass term needed)."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(_SUPP_BASE)).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return edges.join(deg, "src"), deg


def _pagerank_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        its.append(
            f"""it{i} AS (
  SELECT e.dst AS node,
         CAST({_TELEPORT} + ({_DAMP_NUM} * SUM(r.rank // e.deg)) // {_DAMP_DEN}
              AS BIGINT) AS rank
  FROM ed e JOIN {prev} r ON r.node = e.src
  GROUP BY 1
)"""
        )
        prev = f"it{i}"
    return f"""
WITH e0 AS (
  SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT src AS node, CAST({_R0} AS BIGINT) AS rank FROM deg),
{",".join(its)}
SELECT node, rank AS rank_e6 FROM {prev}
"""


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration damped PageRank in micro-unit fixed point:
    rank' = 150000 + (85 * sum_in(rank_src DIV deg_src)) DIV 100.
    The DataFrame loop unrolls into one Catalyst plan (join + groupBy per
    iteration); the oracle unrolls the same three iterations as CTEs."""
    ed, deg = _edges_deg(spark, sf_dir)
    ranks = deg.select(F.col("src").alias("node"), F.lit(_R0).cast("long").alias("rank"))
    for _ in range(_ITERS):
        ranks = (
            ed.join(ranks, ed.src == ranks.node)
            .select(F.col("dst"), F.expr("rank DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(_TELEPORT)
                    + F.expr(f"({_DAMP_NUM} * sum(contrib)) DIV {_DAMP_DEN}")
                )
                .cast("long")
                .alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
    return ranks.select("node", F.col("rank").alias("rank_e6"))
