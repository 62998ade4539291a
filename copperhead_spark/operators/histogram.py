"""Weighted multi-dimensional histogram aggregate.

The reference's core stage-2 operator: fill ``Hist[region, channel,
val/sumw2, bin, variation]`` with per-event weight and weight^2 via nested
Python loops over (region x wgt x syst x channel)
(/root/reference/stage2/histogrammer.py:28-120).  Here the whole thing is
ONE groupBy over (categorical axes..., bin index) with two weighted sums —
one shuffle, partial aggregation on the map side, no loops.

At 100 TB this is the headline aggregation: cardinality of the group key
is (#regions x #channels x #variations x nbins) ~ 10^4-10^5, so the
shuffle output is tiny regardless of input size; the map-side partial agg
does all the data reduction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from copperhead_spark.functions.exact import exact_sum


def bin_index(value: Column, lo: float, hi: float, nbins: int) -> Column:
    """Clamped bin index: -1 underflow, ``nbins`` overflow, else
    floor((x - lo) / width).  Pure expression math (hist.Hist axis
    semantics, histogrammer.py:37-44) — stays in whole-stage codegen;
    identical formula is used in oracle SQL for bit parity."""
    width = (hi - lo) / nbins
    raw = F.floor((value - F.lit(lo)) / F.lit(width)).cast("long")
    return (
        F.when(value < lo, F.lit(-1))
        .when(value >= hi, F.lit(nbins))
        .otherwise(raw)
        .cast("long")
    )


def bin_index_sql(expr: str, lo: float, hi: float, nbins: int) -> str:
    width = (hi - lo) / nbins
    return (
        f"CAST(CASE WHEN ({expr}) < {lo} THEN -1 "
        f"WHEN ({expr}) >= {hi} THEN {nbins} "
        f"ELSE CAST(FLOOR((({expr}) - {lo}) / {width}) AS BIGINT) END AS BIGINT)"
    )


def bin_by_edges(value: Column, edges: Sequence[float]) -> Column:
    """Variable-edge bin index (MVA score binning, postprocessor.py:
    172-196 with edges from config/mva_bins.py): -1 below the first
    edge, len(edges)-1 at/above the last, else the enclosing segment.
    np.digitize(x, edges) - 1 semantics; generated CASE chain stays in
    codegen."""
    expr = F.lit(len(edges) - 1)
    for i in range(len(edges) - 1, 0, -1):
        expr = F.when(value < F.lit(float(edges[i])), F.lit(i - 1)).otherwise(expr)
    return F.when(value < F.lit(float(edges[0])), F.lit(-1)).otherwise(expr).cast("long")


def histogram(
    df: DataFrame,
    value: Column | str,
    lo: float,
    hi: float,
    nbins: int,
    by: Sequence[Column | str] = (),
    weight: Column | None = None,
    scale: int = 4,
) -> DataFrame:
    """Weighted histogram as a DataFrame: one row per (by..., bin_idx) with
    ``value`` = sum(w) and ``sumw2`` = sum(w^2).

    Weighted sums are fixed-point (functions/exact.py) so results are
    order-independent; unweighted falls back to plain counts."""
    value = F.col(value) if isinstance(value, str) else value
    keys = [F.col(k) if isinstance(k, str) else k for k in by]
    binned = df.withColumn("bin_idx", bin_index(value, lo, hi, nbins))
    if weight is None:
        return binned.groupBy(*keys, "bin_idx").agg(
            F.count("*").cast("double").alias("value"),
            F.count("*").cast("double").alias("sumw2"),
        )
    return binned.groupBy(*keys, "bin_idx").agg(
        exact_sum(weight, scale).alias("value"),
        exact_sum(weight * weight, 2 * scale).alias("sumw2"),
    )
