"""Skew mitigation: salted two-stage aggregation.

HEP events are uniform so the reference never needed this (SURVEY.md §4
"skew handling: none"), but at 100 TB with hot keys (a viral doc_id, a
null-heavy join key) one reducer gets the world.  AQE's skew-join
splitting covers joins; for aggregations with pathological key skew the
classic fix is salting: groupBy((key, salt)) partial -> groupBy(key)
final.  Both stages are hash aggs with map-side partials, so the extra
shuffle carries only n_salts rows per hot key.

Only worthwhile for *algebraic* aggregates (sum/count/min/max — anything
with a merge).  Correctness is independent of the salt: the unit test
checks bit-equality with the unsalted plan for fixed-point sums."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum...) with a salt stage.  ``sums`` maps output
    name -> LONG-typed column expression (fixed-point upstream keeps the
    two-stage re-sum exact; double sums would change association)."""
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(name) for name, c in sums.items()],
        F.count("*").alias("_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sums],
        F.sum("_n").alias("n"),
    )
