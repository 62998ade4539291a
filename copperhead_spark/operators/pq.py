"""Arrow-batched IVF+PQ index encoder — the production-shape build
kernel for vector indexes.

The SQL-expression encoders (plans/similarity.py ``assign_expr`` /
``_pq_codes_spark``) are exact and oracle-checkable, but Spark's
higher-order-function lambdas run INTERPRETED (no whole-stage codegen),
so the per-vector cost — k x dim for the coarse cell plus M x K x D for
the codes (~1500 int ops here) — dominates the index build.  This
kernel does the same exact int64 arithmetic as vectorized numpy over
Arrow batches: distances via broadcasting, argmin ties to the lowest id
(numpy argmin returns the first minimum — the same tie-break as the
lexicographic struct-min in the expressions, pinned by
tests/test_round4_regressions.py).

Scale: map-only (centroids + codebooks ship as one broadcast per
executor), embarrassingly parallel over batches — the single-pass
index build the 100 TB story requires.  The expression forms stay
registered (sim_ivf_topk / sim_pq_topk) as independently-checkable
twins, and the DuckDB oracles replay the arithmetic anyway, so a kernel
drift hash-fails the driver gate.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def ivf_pq_index_arrow(
    df: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    id_col: str = "vec_id",
    e6_col: str = "e6",
) -> DataFrame:
    """(id, micro-int vector) -> (vec_id, cid, codes): nearest coarse
    centroid by exact int64 squared L2, plus the per-subspace argmin
    codeword ids.  ``df`` must carry the micro-int array column
    (materialize _E6_SPARK upstream)."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(
        (
            np.asarray(cents, dtype=np.int64),
            [np.asarray(b, dtype=np.int64) for b in books],
        )
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c, bks = bc.value
        m_sub, d_sub = len(bks), bks[0].shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[e6_col].to_numpy()).astype(np.int64)
            diff = x[:, None, :] - c[None, :, :]
            cid = (diff * diff).sum(axis=2).argmin(axis=1)
            codes = np.empty((len(x), m_sub), dtype=np.int64)
            for m in range(m_sub):
                sub = x[:, m * d_sub : (m + 1) * d_sub]
                sd = sub[:, None, :] - bks[m][None, :, :]
                codes[:, m] = (sd * sd).sum(axis=2).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cid": cid.astype(np.int32),
                    "codes": list(codes.astype(np.int32)),
                }
            )

    return df.select(id_col, e6_col).mapInPandas(
        encode, schema="vec_id long, cid int, codes array<int>"
    )
