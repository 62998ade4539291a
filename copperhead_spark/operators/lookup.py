"""Binned-lookup joins and piecewise-linear interpolation.

The reference applies corrections by indexing numpy lookup tables
(coffea "dense_lookup"): pileup weight by nTrueInt
(/root/reference/stage1/corrections/pu_reweight.py:75-85), muon SF by
(pt, |eta|) (lepton_sf.py:79-146), b-tag SF by (flavour, eta, pt,
discriminant) (btag_weights.py:4-61), NNLOPS np.interp (nnlops.py:25-49).

Spark-first design (SURVEY.md §4 custom-helper (a)): a naive broadcast
range join (`ON x >= lo AND x < hi`) becomes a BroadcastNestedLoopJoin —
O(rows x bins) comparisons.  For uniform-width bins we instead compute the
bucket index on the fact side (pure expression, codegen'd) and broadcast
*equi*-join on it — O(rows) with a hash probe.  Non-uniform bins with few
segments compile to a CASE expression chain — zero join at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniform_bucket(x: Column, lo: float, width: float, nbins: int) -> Column:
    """Clamped uniform bin index (clamping mirrors the reference's
    edge-handling, e.g. pu_reweight clamps outside [1,100])."""
    raw = F.floor((x - F.lit(lo)) / F.lit(width)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1))


def uniform_bucket_sql(expr: str, lo: float, width: float, nbins: int) -> str:
    raw = f"CAST(FLOOR((({expr}) - {lo}) / {width}) AS BIGINT)"
    return f"LEAST(GREATEST({raw}, 0), {nbins - 1})"


def binned_lookup_join(
    fact: DataFrame,
    lookup: DataFrame,
    x: Column,
    lo: float,
    width: float,
    nbins: int,
    bucket_col: str = "bin_idx",
) -> DataFrame:
    """1-D uniform-binned lookup as a broadcast equi-join (J6).

    ``lookup`` must carry ``bucket_col`` (0..nbins-1) plus value columns.
    The fact side never shuffles; the lookup broadcasts."""
    keyed = fact.withColumn(bucket_col, uniform_bucket(x, lo, width, nbins))
    return keyed.join(F.broadcast(lookup), on=bucket_col, how="left")


def binned_lookup_join_2d(
    fact: DataFrame,
    lookup: DataFrame,
    x: Column,
    x_spec: tuple[float, float, int],
    y: Column,
    y_spec: tuple[float, float, int],
    x_bucket: str = "x_bin",
    y_bucket: str = "y_bin",
) -> DataFrame:
    """2-D binned lookup (J7: muon SF by (pt, |eta|)) — equi-join on both
    bucket indices."""
    keyed = fact.withColumn(x_bucket, uniform_bucket(x, *x_spec)).withColumn(
        y_bucket, uniform_bucket(y, *y_spec)
    )
    return keyed.join(F.broadcast(lookup), on=[x_bucket, y_bucket], how="left")


def interp1d_expr(x: Column, xs: Sequence[float], ys: Sequence[float]) -> Column:
    """np.interp as a pure column expression (J8, nnlops.py:25-49):
    clamped at both ends, linear blend inside each segment.  For a
    handful of nodes this beats any join; the arithmetic (+,-,*,/) is
    IEEE-deterministic so it bit-matches the SQL twin."""
    assert len(xs) == len(ys) and len(xs) >= 2
    # build from the right so the first matching segment wins
    out = F.lit(float(ys[-1]))
    for i in range(len(xs) - 2, -1, -1):
        x0, x1, y0, y1 = xs[i], xs[i + 1], ys[i], ys[i + 1]
        seg = F.lit(float(y0)) + (F.lit(float(y1 - y0))) * (x - F.lit(float(x0))) / F.lit(
            float(x1 - x0)
        )
        out = F.when(x < F.lit(float(x1)), seg).otherwise(out)
    return F.when(x <= F.lit(float(xs[0])), F.lit(float(ys[0]))).otherwise(out)


def interp1d_sql(expr: str, xs: Sequence[float], ys: Sequence[float]) -> str:
    """SQL twin of :func:`interp1d_expr` — byte-identical arithmetic."""
    out = str(float(ys[-1]))
    for i in range(len(xs) - 2, -1, -1):
        x0, x1, y0, y1 = float(xs[i]), float(xs[i + 1]), float(ys[i]), float(ys[i + 1])
        seg = f"({y0} + ({y1 - y0}) * (({expr}) - {x0}) / {x1 - x0})"
        out = f"CASE WHEN ({expr}) < {x1} THEN {seg} ELSE {out} END"
    return f"CASE WHEN ({expr}) <= {float(xs[0])} THEN {float(ys[0])} ELSE {out} END"
