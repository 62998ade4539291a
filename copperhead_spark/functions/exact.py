"""Exact fixed-point aggregation helpers.

Floating-point addition is not associative, so a plain ``SUM(double)``
depends on partition/merge order — different engines (and different runs
of the *same* engine) can disagree in the last ulps.  The reference
sidesteps this with loose tolerances in its golden tests
(/root/reference/tests/test_tools.py:1-2, abs 1e-5).  For the DuckDB
oracle gate we want *bit-exact* agreement, so money-like aggregates are
computed in fixed point: scale to an integer per row (deterministic IEEE
multiply + round), sum as BIGINT (associative, order-independent), and
divide back to double at the end.  Per-row expressions feeding the scale
step must themselves be deterministic (+, -, *, /, sqrt are IEEE-exact;
transcendentals are not — see functions/physics.py for how those are
handled).

This is also the right call at 100 TB: the integer sum is cheaper than a
Kahan-style compensated sum and exact up to 2^63 (a sum of 6e14 rows of
scale-2 values up to ~1e4 stays in range; pick ``scale`` accordingly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, exact to ``scale``
    decimal places. Returns double."""
    m = 10**scale
    return F.sum(F.round(col * F.lit(m)).cast("long")) / F.lit(float(m))


def exact_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB-dialect twin of :func:`exact_sum` (bit-identical result)."""
    m = 10**scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {m}) AS BIGINT)) AS DOUBLE) / {float(m)}"


def exact_avg(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact fixed-point sum divided by count."""
    m = 10**scale
    total = F.sum(F.round(col * F.lit(m)).cast("long"))
    n = F.count(col)
    return total / (n * F.lit(float(m)))


def exact_avg_sql(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {m}) AS BIGINT)) AS DOUBLE)"
        f" / (COUNT(({expr})) * {float(m)})"
    )


def exact_cumsum(col: Column, window, scale: int = 2) -> Column:
    """Order-independent running SUM over a window (fixed order implies a
    fixed fold order, but fixed point keeps partial-agg reordering exact
    too)."""
    m = 10**scale
    return F.sum(F.round(col * F.lit(m)).cast("long")).over(window) / F.lit(float(m))
