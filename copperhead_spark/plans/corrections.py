"""Parameterized-correction queries (SURVEY.md §2.3 J9 / §2.10 F4 and
§2.8 deterministic random): Rochester-style UDF lookup vs SQL mirror,
and hash-based uniforms replacing np.random."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.operators.rochester import (
    attach_kscale,
    hash_uniform_sql,
    kscale_case_sql,
)
from copperhead_spark.plans.registry import register

# pseudo-muon columns over lineitem
_PT = "l_quantity * CAST(2 AS DOUBLE)"
_ETA = "(l_discount - 0.05) * 48"
_PHI = "(l_tax * 25 - 1) * 3.141592653589793"
_CHARGE = "CASE WHEN l_linenumber % 2 = 0 THEN -1 ELSE 1 END"


@register(
    "j9_param_lookup_udf",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n,
       {exact_sum_sql(kscale_case_sql(f"({_PT})", f"({_ETA})", f"({_PHI})", f"({_CHARGE})"), 8)}
         AS kscale_sum
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("J9", "F4"),
)
def j9_param_lookup_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rochester-style correction: broadcast parameter tables + Arrow
    pandas UDF doing the (charge, eta-bin, phi-bin, pt) lookup
    (rochester.py:5-64 / jec.py factor stacks).  The oracle runs the
    generated CASE mirror — formula has no transcendentals, so the UDF
    is checked bit-for-bit."""
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag",
        f"({_PT}) AS pt",
        f"({_ETA}) AS eta",
        f"({_PHI}) AS phi",
        f"({_CHARGE}) AS charge",
    )
    corrected = attach_kscale(li, "pt", "eta", "phi", "charge")
    return corrected.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        exact_sum(F.col("kscale"), 8).alias("kscale_sum"),
    )


_TIERS = [(0.0, 300.0, "low"), (100.0, 500.0, "mid"), (250.0, 1000.0, "high"), (600.0, 1000.0, "top")]
_TIER_VALUES = ", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in _TIERS)


@register(
    "range_join_bucketed",
    oracle=f"""
SELECT tier, COUNT(*) AS n, {exact_sum_sql("value", 4)} AS value_sum
FROM events
JOIN (SELECT * FROM (VALUES {_TIER_VALUES}) AS t(lo, hi, tier))
  ON value >= lo AND value < hi
GROUP BY tier
""",
    tags=("J6", "rangejoin"),
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic points-in-intervals range join with OVERLAPPING irregular
    intervals, via the bucketed-explode equi-join rewrite
    (operators/rangejoin.py).  The oracle states the same semantics as a
    plain range join — proving the rewrite; the Spark plan is a hash
    join, never a BroadcastNestedLoopJoin."""
    from copperhead_spark.operators.rangejoin import bucketed_range_join

    ev = table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(_TIERS, "lo double, hi double, tier string")
    joined = bucketed_range_join(ev, tiers, F.col("value"), bucket_width=100.0)
    return joined.groupBy("tier").agg(
        F.count("*").alias("n"),
        exact_sum(F.col("value"), 4).alias("value_sum"),
    )


@register(
    "rand_hash_uniform",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {hash_uniform_sql("l_orderkey", "l_linenumber")} AS u
FROM lineitem
WHERE l_orderkey < 2000
""",
    tags=("math", "random"),
)
def rand_hash_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-row uniforms from (event, idx) integer hashing —
    the reproducible replacement for np.random.rand smearing
    (rochester.py:8-9; SURVEY §7 hard part (d)).  Same row -> same u on
    any engine, partitioning, or retry; raw doubles compared."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        f"{hash_uniform_sql('l_orderkey', 'l_linenumber')} AS u",
    )


@register(
    "j17_interval_overlap_join",
    oracle="""
WITH a AS (
  SELECT event_id AS a_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS a_lo,
         CAST(ROUND(value * 1000000) AS BIGINT)
           + 1000000 * (5 + event_id % 7) AS a_hi
  FROM events WHERE event_id % 20 = 0
),
b AS (
  SELECT event_id AS b_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS b_lo,
         CAST(ROUND(value * 1000000) AS BIGINT)
           + 1000000 * (5 + event_id % 5) AS b_hi
  FROM events WHERE event_id % 20 = 1
)
SELECT a_id, b_id,
       CAST(LEAST(a_hi, b_hi) - GREATEST(a_lo, b_lo) AS BIGINT) AS overlap_e6
FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
""",
    tags=("J17", "range"),
)
def j17_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join with NO equi key — the shape Spark plans as
    a BroadcastNestedLoopJoin and a 100 TB cluster cannot run that way.
    Two interval sets derive deterministically from events (micro-int
    endpoints, widths 5-11 units); the bucketed rewrite
    (operators/rangejoin.bucketed_interval_join) explodes BOTH sides
    into covering buckets, hash-joins on bucket with the exact overlap
    residual, and dedups multi-bucket meetings by keeping each pair
    only in the first shared bucket — one equi-join shuffle, zero
    nested loops (the plan audit's no-BNLJ invariant holds).  Output
    pins every overlapping pair AND its exact integer overlap length
    against the oracle's direct quadratic join."""
    from copperhead_spark.operators.rangejoin import bucketed_interval_join

    ev = table(spark, sf_dir, "events")
    a = ev.filter("event_id % 20 = 0").selectExpr(
        "event_id AS a_id",
        "CAST(ROUND(value * 1000000) AS BIGINT) AS a_lo",
        "CAST(ROUND(value * 1000000) AS BIGINT)"
        " + 1000000 * (5 + event_id % 7) AS a_hi",
    )
    b = ev.filter("event_id % 20 = 1").selectExpr(
        "event_id AS b_id",
        "CAST(ROUND(value * 1000000) AS BIGINT) AS b_lo",
        "CAST(ROUND(value * 1000000) AS BIGINT)"
        " + 1000000 * (5 + event_id % 5) AS b_hi",
    )
    joined = bucketed_interval_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=4_000_000
    )
    return joined.selectExpr(
        "a_id",
        "b_id",
        "CAST(LEAST(a_hi, b_hi) - GREATEST(a_lo, b_lo) AS BIGINT) AS overlap_e6",
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
