"""Distributed Lloyd k-means over embedding columns (the training job
behind the IVF ANN index, plans/similarity.py — SURVEY.md §7 step 8
"similarity search: IVF as the scale path").

The reference has no clustering operator; this is beyond-reference
capability for the training-data pipeline (SemDeDup-style semantic dedup
prunes within k-means clusters, and IVF search probes them).

Scale design (billions of vectors, 100 TB):
- Assignment is a PURE PROJECTION: centroids ship as literals inside one
  generated expression (k * dim integers — bytes, not data), so the
  assignment pass is map-only inside whole-stage codegen.  No crossJoin
  of vectors x centroids, no shuffle.
- The update step is ONE hash aggregate: groupBy(cluster) of 64 per-dim
  integer sums + a count — map-side partials reduce each partition to at
  most k rows, the shuffle carries O(k * dim * partitions) integers.
- The driver holds only the k x dim centroid table between iterations
  (collect of k rows/iteration) — Lloyd's loop is driver-orchestrated but
  every data-touching pass is distributed and linear.

Exactness: vectors are micro-quantized (1e-6) to int64 once; squared
distances and per-dim sums are pure int64 arithmetic, so assignment and
update are bit-deterministic regardless of partitioning (no float
accumulation order anywhere).  Ties in the argmin go to the lowest
cluster id via lexicographic struct min.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6_SPARK = "transform({vec}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
E6_DUCK = "list_transform({vec}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"


def deterministic_centroids(k: int, dim: int, salt: int = 97003) -> list[list[int]]:
    """Hash-formula initial centroids in micro-int units: components in
    [-1, 1], unit-normalized, quantized to 1e-6.  Same formula as the
    IVF stand-in (plans/similarity.py _ivf_centroids with salt=97003), so
    `kmeans_lloyd` literally trains the centroids the IVF query probes."""
    out = []
    for cid in range(k):
        v = [((i * 2654435761 + cid * salt) % 2003) / 1001.0 - 1.0 for i in range(1, dim + 1)]
        norm = math.sqrt(sum(x * x for x in v))
        out.append([round(x / norm * 1_000_000) for x in v])
    return out


def assign_expr(centroids: list[list[int]], e6: str = "e6") -> str:
    """SQL expression (Spark dialect): nearest-centroid id by exact int64
    squared distance in micro-units; ties -> lowest cid (struct min).
    ``e6`` must be a micro-int array<bigint> column (materialize
    E6_SPARK once upstream — behind a barrier if the plan is wide)."""
    entries = ", ".join(
        f"struct(aggregate(zip_with({e6}, array({', '.join(str(c) for c in cent)}),"
        f" (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d,"
        f" {cid} AS c)"
        for cid, cent in enumerate(centroids)
    )
    return f"array_min(array({entries})).c"


def assign_expr_duck(centroids: list[list[int]], e6: str = "e6") -> str:
    """DuckDB twin of :func:`assign_expr` (same integer arithmetic);
    ``e6`` must be a plain column (CTE-materialized) — it is referenced
    per dimension per centroid."""
    dim = len(centroids[0])
    entries = ", ".join(
        f"{{'d': list_aggregate(list_transform(range(1, {dim + 1}),"
        f" i -> ({e6}[i] - ([{', '.join(str(c) for c in cent)}])[i])"
        f" * ({e6}[i] - ([{', '.join(str(c) for c in cent)}])[i])), 'sum'),"
        f" 'c': {cid}}}"
        for cid, cent in enumerate(centroids)
    )
    return f"(list_min([{entries}])).c"


def update_step(df: DataFrame, centroids: list[list[int]], vec: str = "embedding") -> DataFrame:
    """One Lloyd update as a single hash aggregate: per cluster, the
    int64 per-dimension component sums and the member count.  The new
    centroid is round(sum/n) driver-side; keeping the query output in
    (sum, n) integer space makes it exactly mergeable and oracle-checkable
    with no rounding-rule coupling between engines."""
    from copperhead_spark.operators.barrier import project_once

    dim = len(centroids[0])
    # barrier: without it CollapseProject re-inlines the e6 transform into
    # every centroid's distance expression (k evaluations per row)
    assigned = project_once(df, f"{E6_SPARK.format(vec=vec)} AS e6").selectExpr(
        f"{assign_expr(centroids)} AS cid", "e6"
    )
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.expr(f"element_at(e6, {i + 1})")).alias(f"s{i}")
            for i in range(dim)
        ],
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    vec: str = "embedding",
) -> list[list[int]]:
    """Lloyd's algorithm: ``iters`` (assignment -> update) rounds from the
    deterministic init.  Each round is one distributed aggregate + one
    k-row collect; empty clusters keep their previous centroid (standard
    Lloyd fallback, deterministic)."""
    cents = deterministic_centroids(k, dim)
    for _ in range(iters):
        rows = update_step(df, cents, vec).collect()
        by_cid = {r["cid"]: r for r in rows}
        cents = [
            [
                div_round_half_away(by_cid[cid][f"s{i}"], by_cid[cid]["n"])
                for i in range(dim)
            ]
            if cid in by_cid
            else cents[cid]
            for cid in range(k)
        ]
    return cents


def div_round_half_away(s: int, n: int) -> int:
    """Exact integer round(s/n), half away from zero, n > 0.  Pure
    int64-safe arithmetic — the former float ``round(s/n)`` carried two
    portability hazards: banker's rounding on ties (no SQL twin) and
    silent precision loss once |s| outgrows 2^53 (inevitable for
    micro-int sums over billions of vectors).  This formula is the one
    the DuckDB training oracle replays, making the full Lloyd loop
    value-checkable."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((-2 * s + n) // (2 * n))
