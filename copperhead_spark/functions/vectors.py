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


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """SQL ROUND semantics (half away from zero; np.rint is half-even)."""
    return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)


def quantize_q8(e6: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 quantization of micro-int vectors:
    round(127.0 * x / amax), same order of IEEE ops as the SQL form
    (multiply first, then divide), so values are bit-identical.  An
    all-zero vector (amax = 0) quantizes to zeros instead of tripping a
    0/0 -> NaN -> undefined int cast."""
    amax = np.abs(e6).max(axis=1, keepdims=True).astype(np.float64)
    amax = np.where(amax == 0.0, 1.0, amax)
    return _round_half_away(127.0 * e6.astype(np.float64) / amax)


def batch_cosine_topk(
    cands,
    queries_pdf: pd.DataFrame,
    topk: int,
    transform=None,
    score_name: str = "cosine",
):
    """Distributed brute-force cosine top-k with per-batch partial top-k.

    ``cands``: DataFrame (cand_id bigint, embedding array<float>);
    ``queries_pdf``: pandas (query_id, embedding) — the query set is small
    by definition and rides into the Arrow UDF as a closure (the same
    ship-small-side-to-every-task shape as a broadcast join).

    Each Arrow batch computes ALL pairwise scores as ONE int64 matmul
    (micro-int space — bit-identical to the zip_with/aggregate expression
    form and therefore to the DuckDB oracle) and emits only its local
    top-k per query; the global top-k window then runs on
    O(partitions * nq * k) rows instead of O(n * nq).  That is the plan
    that survives a billion candidates: the scan is embarrassingly
    parallel, the shuffle is negligible, and no global sort of the
    candidate set ever happens.

    ``transform`` (e.g. quantize_q8) maps micro-int matrices to the space
    the dot product runs in, applied identically to both sides."""
    q6 = _round_half_away(
        np.stack(queries_pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
    )
    Q = transform(q6) if transform is not None else q6
    qn = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    qids = queries_pdf["query_id"].to_numpy().astype(np.int64)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            c6 = _round_half_away(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
            )
            C = transform(c6) if transform is not None else c6
            cn = np.sqrt((C * C).sum(axis=1).astype(np.float64))
            cand_ids = pdf["cand_id"].to_numpy().astype(np.int64)
            # SQL association: dot / (sqrt(qn) * sqrt(cn))
            cos = (C @ Q.T).astype(np.float64) / (cn[:, None] * qn[None, :])
            k = min(topk, len(pdf))
            out_q, out_c, out_s = [], [], []
            for j in range(len(qids)):
                # NaN cosines (zero-norm vectors) must rank FIRST to
                # agree with Spark/DuckDB DESC ordering (both treat NaN
                # as the largest double); np.lexsort on -cos would sort
                # them LAST and make the per-batch top-k
                # partition-dependent vs the global window
                key = np.where(np.isnan(cos[:, j]), -np.inf, -cos[:, j])
                order = np.lexsort((cand_ids, key))[:k]
                out_q.append(np.full(k, qids[j]))
                out_c.append(cand_ids[order])
                out_s.append(cos[order, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    score_name: np.concatenate(out_s),
                }
            )

    from pyspark.sql import Window

    local = cands.mapInPandas(
        gen, schema=f"query_id long, cand_id long, {score_name} double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_name).desc(), F.col("cand_id").asc()
    )
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("query_id", "cand_id", score_name, F.col("rn").cast("long").alias("rank"))
    )
