"""As-of join (merge_asof) as a composition of union + running window.

Spark has no native ASOF JOIN.  The scalable pattern (one shuffle + one
per-key sort, linear in rows — never a range/nested-loop join):

  1. tag right rows 0, left rows 1
  2. union on (key, ts, tag)
  3. running max of struct(right_ts, right payload...) over
     (partitionBy key, orderBy ts, tag, tiebreak)
  4. keep left rows; the running max IS the most recent right row at or
     before each left row (right sorts before left at equal ts, so the
     match is inclusive).

The struct max carries payload columns along with the matched timestamp
(struct comparison is field-lexicographic, so ts dominates).  The
reference has no named as-of operator — its np.interp / index-alignment
lookups are as-of-like (SURVEY.md §2.3 J8 note).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str] = (),
    out_prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key group
    (pd.merge_asof(direction='backward') semantics, inclusive)."""
    on = list(on)
    payload = list(payload)
    left_cols = [c for c in left.columns]

    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]).alias("_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *[F.col(c) for c in left_cols if c not in on],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.max("_pay").over(w)).filter(F.col("_tag") == 1)
    out = matched.select(
        *on,
        *[F.col(c) for c in left_cols if c not in on],
        F.col("_match._rts").alias(f"{out_prefix}{right_ts}"),
        *[F.col(f"_match.{c}").alias(f"{out_prefix}{c}") for c in payload],
    )
    return out
