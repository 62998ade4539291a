"""Spatial analytics: grid-bucketed neighbor joins on deterministic
planar coordinates.

The engine's tables carry no native lat/lon, so coordinates are derived
from keys with the repo-wide portable mix hash — deterministic on both
engines, which keeps the whole family integer-exact (squared Euclidean
distances, no trig, no float drift).  The operator shape is the real
one: a radius join at 100 TB is never a distance cross-join; it is a
grid-cell equi-join (snap each point to a cell the size of the radius,
probe the 3x3 neighborhood) — the same blocking idea as LSH banding,
applied to geometry.  PostGIS/Sedona/H3 pipelines all reduce to this.

Reference analogue: the dR-cone matching joins (J2/J12) are exactly
this pattern in (eta, phi) space; the reference brute-forces them per
event because events are tiny. Here the grid makes the same semantics
scale to unbounded point sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.hashing import mix_sql
from copperhead_spark.plans.registry import register

# world is 100k x 100k; radius 2000 => cell size 2000, 9-cell probe
_GEO_WORLD = 100_000
_GEO_R = 2_000
_GEO_SALT_X, _GEO_SALT_Y = 11, 23


def _xy(key: str) -> tuple[str, str]:
    return (
        f"({mix_sql(key, _GEO_SALT_X)} % {_GEO_WORLD})",
        f"({mix_sql(key, _GEO_SALT_Y)} % {_GEO_WORLD})",
    )


def _geo_oracle() -> str:
    cx, cy = _xy("c_custkey")
    sx, sy = _xy("s_suppkey")
    return f"""
WITH c AS (SELECT c_custkey AS ck, {cx} AS x, {cy} AS y FROM customer),
s AS (SELECT s_suppkey AS sk, {sx} AS x, {sy} AS y FROM supplier),
hits AS (
  SELECT s.sk, c.ck,
         (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y) AS d2
  FROM s JOIN c ON (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y)
                   <= {_GEO_R * _GEO_R}
)
SELECT sk, CAST(COUNT(*) AS BIGINT) AS n_within,
       CAST(MIN(d2) AS BIGINT) AS min_d2,
       CAST(MIN(CASE WHEN d2 = md THEN ck END) AS BIGINT) AS nearest_ck
FROM (SELECT *, MIN(d2) OVER (PARTITION BY sk) AS md FROM hits)
GROUP BY sk ORDER BY sk
"""


@register("geo_grid_radius_join", oracle=_geo_oracle(), tags=("geo", "join"))
def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: for every supplier point, count/locate all customer
    points within distance R on the deterministic integer plane —
    executed as a grid-cell equi-join (cell = R, probe the 3x3
    neighborhood, then the exact squared-distance filter), proven equal
    to the oracle's brute-force distance predicate.  Squared distances
    keep it BIGINT-exact; the nearest customer is the (min d2, min key)
    argmin.

    Scale design: snapping both sides to R-sized cells turns the O(n*m)
    distance predicate into an equi-shuffle on cell id where each probe
    explodes to only its 9 neighbor cells — candidate volume tracks
    true point density per cell, not corpus size (the geometric
    counterpart of LSH banding).  The exact filter runs map-side after
    the join; the per-supplier rollup reuses nothing global.  With a
    skewed world (cities), the cell id is the salt key: AQE skew-join
    or an explicit per-cell salt splits hot cells.

    Reference analogue: J2/J12 dR-cone matching, made scalable."""
    cxe, cye = _xy("c_custkey")
    sxe, sye = _xy("s_suppkey")
    cust = table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS ck", f"{cxe} AS x", f"{cye} AS y"
    )
    sup = table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey AS sk", f"{sxe} AS x", f"{sye} AS y"
    )
    c_cells = cust.selectExpr("ck", "x", "y", f"x DIV {_GEO_R} AS gx", f"y DIV {_GEO_R} AS gy")
    # each supplier probes its 3x3 cell neighborhood
    s_probe = sup.selectExpr(
        "sk",
        "x AS sx",
        "y AS sy",
        f"explode(sequence(x DIV {_GEO_R} - 1, x DIV {_GEO_R} + 1)) AS gx",
    ).selectExpr(
        "sk",
        "sx",
        "sy",
        "gx",
        f"explode(sequence(sy DIV {_GEO_R} - 1, sy DIV {_GEO_R} + 1)) AS gy",
    )
    hits = (
        s_probe.join(c_cells, ["gx", "gy"])
        .withColumn(
            "d2",
            (F.col("sx") - F.col("x")) * (F.col("sx") - F.col("x"))
            + (F.col("sy") - F.col("y")) * (F.col("sy") - F.col("y")),
        )
        .filter(F.col("d2") <= F.lit(_GEO_R * _GEO_R))
    )
    return (
        hits.groupBy("sk")
        .agg(
            F.count("*").cast("long").alias("n_within"),
            F.min("d2").cast("long").alias("min_d2"),
            F.min(F.struct(F.col("d2"), F.col("ck")))
            .getField("ck")
            .cast("long")
            .alias("nearest_ck"),
        )
        .orderBy("sk")
    )
