"""Bucketed range join: scalable points-in-intervals.

Spark plans a broadcast range join (`ON x >= lo AND x < hi`) as a
BroadcastNestedLoopJoin — every row probes every interval.  Fine for a
25-row lumi mask, catastrophic for a million intervals.  The scalable
rewrite (used by every production range-join implementation):

  1. pick a bucket width w
  2. explode each interval into the buckets it covers
     (floor(lo/w) .. floor((hi-epsilon)/w))
  3. bucket each point: floor(x/w)
  4. EQUI-join on bucket (hash join, shuffle or broadcast)
  5. refine with the exact predicate lo <= x < hi

Each point lives in exactly one bucket, so no dedup is needed even with
overlapping intervals; cost is O(points + intervals x avg_span/w) rather
than O(points x intervals).  The reference's binned lookups (SURVEY.md
J6/J7) are the uniform special case; this operator handles arbitrary
interval sets."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    x: Column,
    lo: str = "lo",
    hi: str = "hi",
    bucket_width: float = 100.0,
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join each point row to every interval row with lo <= x < hi.

    ``intervals`` must carry ``lo``/``hi`` columns (hi exclusive) plus
    payload columns.  Intervals are exploded to covering buckets; the
    join is an equi-join on bucket + refine filter."""
    w = float(bucket_width)
    exploded = intervals.withColumn(
        "_ibucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(w)).cast("long"),
                # floor(hi/w) with NO epsilon: when hi sits exactly on a
                # bucket boundary this explodes one extra (empty) bucket
                # that the residual x < hi filter discards, whereas the
                # epsilon form silently LOST points whose hi lay within
                # 1e-9 above a boundary
                F.floor(F.col(hi) / F.lit(w)).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    keyed = points.withColumn("_bucket", F.floor(x / F.lit(w)).cast("long"))
    # The exact range predicate lives INSIDE the join condition (hash join
    # on bucket equality + residual range filter), not as a post-join
    # filter: with outer `how` a post-join filter would drop unmatched
    # rows (NULL lo/hi fail any comparison) AND points whose bucket
    # matched but whose refine failed, silently degrading to inner.
    cond = (
        (keyed["_bucket"] == exploded["_ibucket"])
        & (x >= exploded[lo])
        & (x < exploded[hi])
    )
    return keyed.join(exploded, cond, how).drop("_bucket", "_ibucket")


def bucketed_interval_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-OVERLAP join (two interval sets, no equi key) without a
    nested-loop: the same bucket-expansion rewrite as
    :func:`bucketed_range_join`, applied to BOTH sides.

    INNER join only, by construction: both sides are exploded into
    covering buckets with the first-shared-bucket dedup predicate in the
    ON clause, so an outer variant would emit one spurious
    null-extended row per non-first-bucket exploded copy.  (For outer
    range semantics against a point side, use bucketed_range_join, which
    explodes only one side and documents the outer contract.)

    Each half-open interval [lo, hi) explodes into its covering buckets;
    the join is an equi-join on bucket with the exact overlap predicate
    (a_lo < b_hi AND b_lo < a_hi) as residual.  Overlapping pairs can
    meet in SEVERAL shared buckets, so the pair is kept only in the
    FIRST bucket both intervals cover — bucket == greatest(a_lo DIV w,
    b_lo DIV w) — which dedups without a distinct shuffle.  Cost is
    O(|A| + |B|) x avg_span/w exploded rows through one hash join,
    versus O(|A| x |B|) for the BNLJ Spark would otherwise plan.

    Coordinates must be non-negative BIGINTs (micro-quantize doubles
    upstream — also what makes results bit-exact) and intervals
    non-empty (hi > lo); column names must not collide across sides."""
    w = int(bucket_width)
    ea = a.withColumn(
        "_abk",
        F.explode(F.sequence(F.expr(f"{a_lo} DIV {w}"), F.expr(f"({a_hi} - 1) DIV {w}"))),
    )
    eb = b.withColumn(
        "_bbk",
        F.explode(F.sequence(F.expr(f"{b_lo} DIV {w}"), F.expr(f"({b_hi} - 1) DIV {w}"))),
    )
    cond = (
        (ea["_abk"] == eb["_bbk"])
        & (ea[a_lo] < eb[b_hi])
        & (eb[b_lo] < ea[a_hi])
        & (ea["_abk"] == F.greatest(F.expr(f"{a_lo} DIV {w}"), F.expr(f"{b_lo} DIV {w}")))
    )
    return ea.join(eb, cond, "inner").drop("_abk", "_bbk")
