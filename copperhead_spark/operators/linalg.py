"""Distributed dense linear algebra over embedding columns.

The piece the similarity/dedup family needs that no single built-in
provides: corpus-level second-moment statistics (Gram / covariance) and
cheap dimensionality reduction, both phrased so the big side is touched
once, map-only.

Scale design (100 TB of embeddings):
- ``gram_matrix``: X^T X via per-batch numpy matmul inside mapInPandas —
  each Arrow batch of n rows collapses to a dim x dim partial (2080 rows
  for dim=64), so the shuffle moves O(partitions * dim^2) rows, never
  O(n).  This is the map-side-combine pattern for matrix aggregation;
  the groupBy that merges partials is vocabulary-sized.
- arithmetic is exact int64 (micro-int fixed point, matching the e6
  convention in plans/similarity.py): partial products stay < 2^63 for
  any realistic batch, and integer sums are order-independent, so the
  result is bit-deterministic and DuckDB-checkable.
- ``random_projection`` (in plans/linalg.py) is a pure per-row
  expression — zero shuffle; the JL sign matrix is a compile-time
  literal, not data.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6_SCALE = 1_000_000


def gram_matrix_int(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Upper-triangular Gram matrix sum_rows(x_i * x_j) over a vector
    column in exact micro-int fixed point.

    Returns (i, j, s): 1-based dims with i <= j, s = exact int64
    sum of e6_i * e6_j (e12-scaled second moments).
    """
    import numpy as np
    import pandas as pd

    from copperhead_spark.functions.vectors import _round_half_away

    iu0, iu1 = np.triu_indices(dim)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # SQL ROUND (half away from zero), matching the DuckDB oracle
            X = _round_half_away(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * E6_SCALE
            ).astype(np.int64)
            G = X.T @ X  # int64 matmul: exact, order-independent
            yield pd.DataFrame(
                {"i": iu0 + 1, "j": iu1 + 1, "s": G[iu0, iu1]}
            )

    partials = df.select(vec_col).mapInPandas(partial, "i LONG, j LONG, s LONG")
    return partials.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s"))


def gram_matrix(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Upper-triangular Gram matrix (i, j, sum_xy) with sum_xy scaled
    back to double (value = exact e12 integer sum / 1e12)."""
    return gram_matrix_int(df, vec_col, dim).select(
        "i",
        "j",
        (F.col("s").cast("double") / F.lit(float(E6_SCALE) ** 2)).alias("sum_xy"),
    )


def jl_signs(dim_in: int, dim_out: int) -> list[list[int]]:
    """Deterministic +/-1 Johnson-Lindenstrauss sign matrix (column j of
    the projection), from the same LCG-style integer hash family as the
    rest of the repo — reproducible everywhere, no RNG state."""
    return [
        [
            1 - 2 * (((i * 1013904223 + j * 1664525 + 12345) % 2147483647) % 2)
            for i in range(dim_in)
        ]
        for j in range(dim_out)
    ]
