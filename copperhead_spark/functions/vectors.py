"""Vector kernels for embedding columns.

The expression form (zip_with + aggregate in micro-int space,
plans/similarity.py) is the portable reference; Spark runs HOF lambdas
interpreted, so an all-pairs sweep pays ~100 ns/element in virtual
dispatch.  This Arrow kernel computes the IDENTICAL int64 dot products
with one vectorized numpy op per batch (stack -> elementwise multiply ->
row sum), so the DuckDB oracle built from the expression form still
checks it value-for-value."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def micro_dot_udf():
    """pandas UDF (a array<float>, b array<float>) -> bigint:
    sum_i round(a_i*1e6) * round(b_i*1e6), matching the SQL micro-int
    dot exactly (explicit half-away-from-zero rounding = SQL ROUND
    semantics; np.rint would be half-even)."""

    def _round_half_away(x: np.ndarray) -> np.ndarray:
        return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)

    @F.pandas_udf("long")
    def _dot(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            a = np.stack(pdf["a"].to_numpy()).astype(np.float64)
            b = np.stack(pdf["b"].to_numpy()).astype(np.float64)
            ai = _round_half_away(a * 1e6)
            bi = _round_half_away(b * 1e6)
            yield pd.Series((ai * bi).sum(axis=1))

    return _dot


def pair_dot(df, a: str, b: str, out: str = "dot"):
    struct = F.struct(F.col(a).alias("a"), F.col(b).alias("b"))
    return df.withColumn(out, micro_dot_udf()(struct))
