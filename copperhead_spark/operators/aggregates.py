"""Custom aggregates Spark lacks natively (SURVEY.md §2.4 A2, §7 hard
part (a)): per-group product with signed values.

The reference takes per-group products in three places: opposite-sign
muon check (product of charges == -1, processor.py:260), per-event b-tag
SF product (btag_weights.py:18,59-60), per-jet QGL weight product
(qgl_weights.py:4-18).  exp(sum(log)) fails on zeros/negatives, so:

- sign product of ±1 charges: parity of the negative count — exact
  integer math, no float at all.
- general product: sign from the negative-count parity, zero from any
  zero, magnitude from a deterministic fold over the sorted multiset
  (array_sort fixes the fold order, so the result is run-to-run stable —
  plain exp(sum(log)) would also be order-sensitive in the last ulps).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sign_product(charge: Column) -> Column:
    """Product of ±1 charges per group: -1 iff an odd number of negatives
    (processor.py:260 opposite-sign dimuon check). Exact integers."""
    n_neg = F.sum(F.when(charge < 0, 1).otherwise(0))
    return F.when(n_neg % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def sign_product_sql(expr: str) -> str:
    return (
        f"CASE WHEN SUM(CASE WHEN ({expr}) < 0 THEN 1 ELSE 0 END) % 2 = 0 "
        f"THEN 1 ELSE -1 END"
    )


def product_agg(x: Column) -> Column:
    """General per-group product (b-tag SF product): deterministic
    left-fold over the value-sorted multiset.  Handles zeros and
    negatives; stays in the JVM (higher-order `aggregate`, no UDF)."""
    return F.aggregate(
        F.array_sort(F.collect_list(x)),
        F.lit(1.0),
        lambda acc, v: acc * v,
    )
