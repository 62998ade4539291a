"""Similarity search over embedding columns (mandated beyond-reference
capability): brute-force cosine top-k baseline + random-hyperplane LSH
bucketing as the scale path.

Dot products and norms run in micro-unit integer space (exact, order-
independent — functions/exact.py discipline), so cosines are bit-equal
across engines and the top-k ordering itself is deterministic.

Scale design (billions of vectors):
- top-k: broadcast the (small) query set, per-partition partial top-k via
  window over (query, candidate) — never a global sort of all candidates.
- LSH: signature is a per-row expression; bucket counts are one groupBy.
  An IVF variant is bucket-join (probe -> centroid bucket -> candidates)
  with the same plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.operators.pq import ivf_pq_index_arrow
from copperhead_spark.plans.registry import register

_MICRO_S = "CAST(ROUND(CAST({e} AS DOUBLE) * 1000000) AS BIGINT)"


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"{_MICRO_S.format(e='x')} * {_MICRO_S.format(e='y')}),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _norm2_spark(a: str) -> str:
    return (
        f"aggregate(transform({a}, x -> {_MICRO_S.format(e='x')} * {_MICRO_S.format(e='x')}),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, 65), i -> "
        f"{_MICRO_S.format(e=a + '[i]')} * {_MICRO_S.format(e=b + '[i]')}), 'sum')"
    )


_TOPK = 5
_NQ = 5

_COSINE_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe,
         {_dot_duck("embedding", "embedding")} AS qn
  FROM embeddings WHERE vec_id < {_NQ}
),
c AS (
  SELECT vec_id AS cand_id, embedding AS ce,
         {_dot_duck("embedding", "embedding")} AS cn
  FROM embeddings WHERE vec_id >= {_NQ}
),
scored AS (
  SELECT query_id, cand_id,
         CAST({_dot_duck("qe", "ce")} AS DOUBLE)
           / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine
  FROM q, c
)
SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
  ) AS rn FROM scored
) WHERE rn <= {_TOPK}
"""


@register("sim_cosine_topk", oracle=_COSINE_TOPK_ORACLE, tags=("similarity",))
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the query set (vec_id < 5) ships into a
    vectorized Arrow kernel; each batch scores all pairs as ONE int64
    matmul and emits its local top-5 per query, so the final window sees
    O(partitions * nq * k) rows, never the candidate set
    (functions/vectors.py batch_cosine_topk).  Micro-int arithmetic keeps
    it bit-equal to the zip_with/aggregate expression form the DuckDB
    oracle runs."""
    from copperhead_spark.functions.vectors import batch_cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < _NQ)
        .selectExpr("vec_id AS query_id", "embedding")
        .toPandas()
    )
    c = emb.filter(F.col("vec_id") >= _NQ).selectExpr("vec_id AS cand_id", "embedding")
    return batch_cosine_topk(c, queries, _TOPK, score_name="cosine")


# random-hyperplane LSH: 8 deterministic +/-1 planes over 64 dims
_NPLANES = 8


# plane sign formula: 1 if ((i * 2654435761 + j * 40503) % 7) < 3 else -1
# — it lives INLINE in the _lsh_bit_spark/_lsh_bit_duck SQL strings
# below (the single source of truth; a Python twin drifted once and
# was removed)


def _lsh_bit_spark(j: int) -> str:
    dot = (
        f"aggregate(sequence(1, 64), CAST(0 AS BIGINT), (acc, i) -> acc + "
        f"{_MICRO_S.format(e='element_at(embedding, i)')}"
        f" * (CASE WHEN ((i * 2654435761 + {j} * 40503) % 7) < 3 THEN 1 ELSE -1 END))"
    )
    return f"CASE WHEN ({dot}) > 0 THEN {2**j} ELSE 0 END"


def _lsh_bit_duck(j: int) -> str:
    dot = (
        f"list_aggregate(list_transform(range(1, 65), i -> "
        f"{_MICRO_S.format(e='embedding[i]')}"
        f" * (CASE WHEN ((i * 2654435761 + {j} * 40503) % 7) < 3 THEN 1 ELSE -1 END)), 'sum')"
    )
    return f"CASE WHEN ({dot}) > 0 THEN {2**j} ELSE 0 END"


_LSH_ORACLE = f"""
SELECT CAST({" + ".join(_lsh_bit_duck(j) for j in range(_NPLANES))} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
FROM embeddings
GROUP BY 1
"""


@register("sim_lsh_buckets", oracle=_LSH_ORACLE, tags=("similarity",))
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing (the ANN scale path): 8-bit
    signature from sign(dot(e, plane_j)) with deterministic +/-1 planes;
    candidate generation = equi-join on bucket.  Signature is a pure
    expression; the only shuffle is the bucket groupBy."""
    emb = table(spark, sf_dir, "embeddings")
    sig = " + ".join(_lsh_bit_spark(j) for j in range(_NPLANES))
    return (
        emb.selectExpr("vec_id", f"CAST({sig} AS BIGINT) AS bucket")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-partitioned ANN (the second scale path besides LSH, SURVEY §7):
# driver-held quantized centroids -> shuffle-free cluster assignment as a
# pure projection -> broadcast probe join -> top-k only within probed
# clusters.  At 100 TB the centroids come from an offline training job
# (k-means on a sample) and are shipped as literals/broadcast exactly as
# here; the deterministic stand-in generates them from a hash formula
# (no I/O, SF-independent), unit-normalizes, and quantizes to 1e-6
# (int64) so the assignment argmax is exact integer arithmetic —
# bit-equal across engines, no float tie ambiguity.
# ---------------------------------------------------------------------------

_IVF_NC = 8  # centroids
_IVF_DIM = 64
_IVF_NPROBE = 4  # clusters probed per query (recall floor: sim_ivf_recall)


def _ivf_centroids() -> list[list[int]]:
    """Deterministic stand-in for trained centroids — THE single source
    is operators/kmeans.deterministic_centroids (same formula, salt
    97003), so `kmeans_lloyd` literally trains the centroids the IVF
    query probes and the two can never drift bit-wise."""
    from copperhead_spark.operators.kmeans import deterministic_centroids

    return deterministic_centroids(_IVF_NC, _IVF_DIM)


def _ivf_score_spark(q6: list[int]) -> str:
    lits = ", ".join(str(v) for v in q6)
    return (
        f"aggregate(zip_with(embedding, array({lits}), (x, y) -> "
        f"{_MICRO_S.format(e='x')} * CAST(y AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _ivf_score_duck(q6: list[int]) -> str:
    lits = ", ".join(str(v) for v in q6)
    return (
        f"list_aggregate(list_transform(range(1, 65), i -> "
        f"{_MICRO_S.format(e='embedding[i]')} * CAST(([{lits}])[i] AS BIGINT)), 'sum')"
    )


def _ivf_assign_spark(cents: list[list[int]]) -> str:
    """argmax centroid id: max of (score, -cid) structs, ties -> lowest cid."""
    entries = ", ".join(
        f"struct({_ivf_score_spark(q6)} AS s, {-cid} AS nc)"
        for cid, q6 in enumerate(cents)
    )
    return f"-array_max(array({entries})).nc"


def _ivf_assign_duck(cents: list[list[int]]) -> str:
    entries = ", ".join(
        f"{{'s': {_ivf_score_duck(q6)}, 'nc': {-cid}}}"
        for cid, q6 in enumerate(cents)
    )
    return f"-(list_max([{entries}])).nc"


def _ivf_probes_spark(cents: list[list[int]]) -> str:
    """top-nprobe centroid ids: ascending sort on (-score, cid) structs."""
    entries = ", ".join(
        f"struct(-{_ivf_score_spark(q6)} AS ns, {cid} AS c)"
        for cid, q6 in enumerate(cents)
    )
    return (
        f"transform(slice(array_sort(array({entries})), 1, {_IVF_NPROBE}), x -> x.c)"
    )


def _ivf_probes_duck(cents: list[list[int]]) -> str:
    entries = ", ".join(
        f"{{'ns': -({_ivf_score_duck(q6)}), 'c': {cid}}}"
        for cid, q6 in enumerate(cents)
    )
    return f"(list_transform(list_sort([{entries}]), x -> x.c))[1:{_IVF_NPROBE}]"


def _ivf_oracle() -> str:
    cents = _ivf_centroids()
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe,
         {_dot_duck("embedding", "embedding")} AS qn,
         unnest({_ivf_probes_duck(cents)}) AS probe
  FROM embeddings WHERE vec_id < {_NQ}
),
c AS (
  SELECT vec_id AS cand_id, embedding AS ce,
         {_dot_duck("embedding", "embedding")} AS cn,
         {_ivf_assign_duck(cents)} AS cid
  FROM embeddings WHERE vec_id >= {_NQ}
),
scored AS (
  SELECT query_id, cand_id,
         CAST({_dot_duck("qe", "ce")} AS DOUBLE)
           / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine
  FROM q JOIN c ON q.probe = c.cid
)
SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
  ) AS rn FROM scored
) WHERE rn <= {_TOPK}
"""


@register("sim_ivf_topk", oracle=_ivf_oracle(), tags=("similarity",))
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: cluster assignment is a shuffle-free projection
    against driver-held quantized centroids; each query probes its
    {_IVF_NPROBE} nearest clusters; exact cosine re-ranking runs only inside probed
    clusters.  The oracle mirrors the IVF algorithm itself (same
    centroids, same integer arithmetic), so parity is exact even though
    IVF is approximate relative to the brute-force `sim_cosine_topk`."""
    cents = _ivf_centroids()
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NQ).selectExpr(
        "vec_id AS query_id",
        "embedding AS qe",
        f"{_norm2_spark('embedding')} AS qn",
        f"explode({_ivf_probes_spark(cents)}) AS cid",
    )
    c = emb.filter(F.col("vec_id") >= _NQ).selectExpr(
        "vec_id AS cand_id",
        "embedding AS ce",
        f"{_norm2_spark('embedding')} AS cn",
        f"{_ivf_assign_spark(cents)} AS cid",
    )
    scored = c.join(F.broadcast(q), "cid").selectExpr(
        "query_id",
        "cand_id",
        f"CAST({_dot_spark('qe', 'ce')} AS DOUBLE)"
        " / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "cand_id", "cosine", F.col("rn").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (the ANN compression path): per-vector
# symmetric scale amax/127, so a 64-dim float32 vector becomes 64 bytes —
# 4x smaller scan + cache footprint, and the quantized dot product is
# small-integer math.  At 100 TB the candidate sweep runs on q8 vectors
# (this query); exact-float re-ranking of the shortlist reuses
# sim_cosine_topk's kernel.  Quantization is exact integer arithmetic on
# both engines (micro-ints -> one IEEE-double division -> ROUND, which
# both engines evaluate identically), so even this "lossy" operator is
# full-value oracle-checked.
# ---------------------------------------------------------------------------

_Q8_SPARK = f"""
transform({{e6}}, x -> CAST(ROUND(127.0 * CAST(x AS DOUBLE)
  / CAST(array_max(transform({{e6}}, y -> abs(y))) AS DOUBLE)) AS BIGINT))
"""

_E6_SPARK = "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT))"
_E6_DUCK = "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT))"

_QDOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT),"
    " (acc, v) -> acc + v)"
)
_QDOT_DUCK = (
    "list_aggregate(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), 'sum')"
)

_Q8_TOPK_ORACLE = f"""
WITH m AS (
  SELECT vec_id, {_E6_DUCK} AS e6 FROM embeddings
),
s AS (
  SELECT vec_id,
         list_transform(e6, x -> CAST(ROUND(127.0 * CAST(x AS DOUBLE)
           / CAST(list_max(list_transform(e6, y -> abs(y))) AS DOUBLE)) AS BIGINT))
           AS q8
  FROM m
),
q AS (
  SELECT vec_id AS query_id, q8 AS qq,
         {_QDOT_DUCK.format(a="q8", b="q8")} AS qn
  FROM s WHERE vec_id < {_NQ}
),
c AS (
  SELECT vec_id AS cand_id, q8 AS cq,
         {_QDOT_DUCK.format(a="q8", b="q8")} AS cn
  FROM s WHERE vec_id >= {_NQ}
),
scored AS (
  SELECT query_id, cand_id,
         CAST({_QDOT_DUCK.format(a="qq", b="cq")} AS DOUBLE)
           / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS qcosine
  FROM q, c
)
SELECT query_id, cand_id, qcosine, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY qcosine DESC, cand_id ASC
  ) AS rn FROM scored
) WHERE rn <= {_TOPK}
"""


@register("sim_quantized_topk", oracle=_Q8_TOPK_ORACLE, tags=("similarity",))
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over int8-quantized vectors: per-vector symmetric
    scale (amax/127) applied inside the same Arrow matmul kernel as the
    exact sweep (quantize_q8 ∘ batch_cosine_topk) — the candidate scan
    touches 1/4 the bytes, per-batch local top-k keeps the shuffle
    negligible, and the quantization rounding (half away from zero, the
    SQL ROUND rule) keeps every value bit-equal to the expression-form
    oracle."""
    from copperhead_spark.functions.vectors import batch_cosine_topk, quantize_q8

    emb = table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < _NQ)
        .selectExpr("vec_id AS query_id", "embedding")
        .toPandas()
    )
    c = emb.filter(F.col("vec_id") >= _NQ).selectExpr("vec_id AS cand_id", "embedding")
    return batch_cosine_topk(c, queries, _TOPK, transform=quantize_q8, score_name="qcosine")


def _ivf_recall_oracle() -> str:
    return f"""
SELECT e.query_id,
       CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ({_COSINE_TOPK_ORACLE}) e
LEFT JOIN ({_ivf_oracle()}) i
  ON e.query_id = i.query_id AND e.cand_id = i.cand_id
GROUP BY e.query_id
"""


@register("sim_ivf_recall", oracle=_ivf_recall_oracle(), tags=("similarity",))
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k quality gate for the IVF ANN path: per query, the number
    of exact brute-force top-{_TOPK} neighbors the IVF probe recovered.
    Both inputs are the registered, oracle-checked builders, and both are
    deterministic integer pipelines, so the recall fraction itself is an
    exact, hashable value — the ANN approximation QUALITY is pinned by
    the correctness gate, not just its determinism.  The floor (mean
    recall >= 0.6 at nprobe={_IVF_NPROBE}) is asserted in
    tests/test_operators.py; production tunes nprobe against this same
    query."""
    exact = sim_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    approx = (
        sim_ivf_topk(spark, sf_dir)
        .select("query_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_match"),
            F.count("*").cast("long").alias("k"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*").cast("double")
            ).alias("recall"),
        )
    )


_NEARDUP_T = 0.40

_NEARDUP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding, {_dot_duck("embedding", "embedding")} AS n2
  FROM embeddings
)
SELECT a.vec_id AS vec1, b.vec_id AS vec2,
       CAST({_dot_duck("a.embedding", "b.embedding")} AS DOUBLE)
         / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE))) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE CAST({_dot_duck("a.embedding", "b.embedding")} AS DOUBLE)
        / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE))) >= {_NEARDUP_T}
"""


# ---------------------------------------------------------------------------
# k-means (the IVF centroid training job) + SemDeDup-style semantic dedup.
# Lloyd's loop is iterative (rows-only check); its single data-touching
# pass — the update step — IS SQL-expressible and full-value checked.
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_DIM = 64


def _kmeans_update_oracle() -> str:
    from copperhead_spark.operators.kmeans import (
        E6_DUCK,
        assign_expr_duck,
        deterministic_centroids,
    )

    cents = deterministic_centroids(_KM_K, _KM_DIM)
    sums = ", ".join(
        f"CAST(SUM(e6[{i + 1}]) AS BIGINT) AS s{i}" for i in range(_KM_DIM)
    )
    return f"""
WITH m AS (SELECT {E6_DUCK.format(vec="embedding")} AS e6 FROM embeddings),
a AS (SELECT {assign_expr_duck(cents)} AS cid, e6 FROM m)
SELECT CAST(cid AS INTEGER) AS cid, COUNT(*) AS n, {sums}
FROM a GROUP BY cid
"""


@register("kmeans_update_step", oracle=_kmeans_update_oracle(), tags=("similarity", "ml"))
def kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd k-means update (operators/kmeans.py): map-only nearest-
    centroid assignment against literal centroids (no crossJoin, no
    shuffle) + ONE hash aggregate of per-dimension int64 sums.  This is
    the entire per-iteration data pass of the IVF centroid training job;
    micro-int arithmetic makes assignment and sums bit-deterministic, so
    even the argmin tie behavior is oracle-pinned."""
    from copperhead_spark.operators.kmeans import deterministic_centroids, update_step

    emb = table(spark, sf_dir, "embeddings")
    return update_step(emb, deterministic_centroids(_KM_K, _KM_DIM))


_KM_ITERS = 3


def _kmeans_train_oracle() -> str:
    """Unrolled Lloyd loop as plain CTEs (the kcore-oracle pattern):
    per iteration, distances vs the previous centroid TABLE (k-row cross
    join — oracle-scale; the engine's assignment is a literal-centroid
    projection precisely to avoid this join), struct-min argmin (ties ->
    lowest cid), per-dim integer sums via zipped unnest, and the exact
    integer round-half-away(sum/n) update; empty clusters carry their
    previous centroid forward."""
    from copperhead_spark.operators.kmeans import E6_DUCK, deterministic_centroids

    cents0 = deterministic_centroids(_KM_K, _KM_DIM)
    c0_rows = ", ".join(
        f"({cid}, [{', '.join(str(v) for v in cent)}])"
        for cid, cent in enumerate(cents0)
    )
    its = []
    prev = "c0"
    for t in range(1, _KM_ITERS + 1):
        its.append(
            f"""d{t} AS (
  SELECT v.vec_id, c.cid,
         list_aggregate(list_transform(range(1, {_KM_DIM + 1}),
           i -> (v.e6[i] - c.cent[i]) * (v.e6[i] - c.cent[i])), 'sum') AS dist
  FROM m v CROSS JOIN {prev} c
),
a{t} AS (
  SELECT vec_id, (MIN({{'d': dist, 'c': cid}})).c AS cid
  FROM d{t} GROUP BY vec_id
),
s{t} AS (
  SELECT cid, i, CAST(SUM(val) AS BIGINT) AS s, COUNT(*) AS n
  FROM (
    SELECT a.cid, unnest(range(1, {_KM_DIM + 1})) AS i, unnest(v.e6) AS val
    FROM a{t} a JOIN m v USING (vec_id)
  )
  GROUP BY cid, i
),
c{t} AS (
  SELECT cid,
         list(CAST(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                        ELSE -(((-2 * s) + n) // (2 * n)) END AS BIGINT)
              ORDER BY i) AS cent
  FROM s{t} GROUP BY cid
  UNION ALL
  SELECT cid, cent FROM {prev}
  WHERE cid NOT IN (SELECT cid FROM s{t})
)"""
        )
        prev = f"c{t}"
    return f"""
WITH m AS (SELECT vec_id, {E6_DUCK.format(vec="embedding")} AS e6 FROM embeddings),
c0 AS (
  SELECT cid, list_transform(cent, x -> CAST(x AS BIGINT)) AS cent
  FROM (VALUES {c0_rows}) v(cid, cent)
),
{",".join(its)}
SELECT CAST(cid AS INTEGER) AS cid, array_to_string(cent, ',') AS centroid
FROM {prev}
"""


@register("sim_kmeans_train", oracle=_kmeans_train_oracle(), tags=("similarity", "ml"))
def sim_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd training loop ({_KM_ITERS} iterations): driver
    orchestrates, every data pass is the oracle-checked update_step
    shape (map-only literal-centroid assignment + one k-row hash
    aggregate), and only k rows cross the driver boundary per iteration.
    VALUE-CHECKED end-to-end: the centroid update is exact integer
    round-half-away (operators/kmeans.div_round_half_away — no float
    division anywhere, so the result is exact at any sum magnitude),
    which lets the DuckDB oracle replay all {_KM_ITERS} iterations as
    unrolled CTEs and pin every trained centroid component bit-exactly.
    Also mirrored bit-exactly in numpy (tests/test_operators.py).
    Centroids cross the driver gate serialized (comma-joined) — raw
    ARRAY output columns are not driver-hashable (CORRECTNESS_r04)."""
    from copperhead_spark.operators.kmeans import kmeans_lloyd

    emb = table(spark, sf_dir, "embeddings")
    cents = kmeans_lloyd(emb, k=_KM_K, iters=_KM_ITERS, dim=_KM_DIM)
    rows = [(cid, ",".join(str(int(v)) for v in cent)) for cid, cent in enumerate(cents)]
    return spark.createDataFrame(rows, "cid int, centroid string")


_SEM_T = 0.35


def _semantic_dedup_oracle() -> str:
    from copperhead_spark.operators.kmeans import (
        E6_DUCK,
        assign_expr_duck,
        deterministic_centroids,
    )

    cents = deterministic_centroids(_KM_K, _KM_DIM)
    return f"""
WITH m AS (SELECT vec_id, {E6_DUCK.format(vec="embedding")} AS e6 FROM embeddings),
v AS (SELECT vec_id, e6, {assign_expr_duck(cents)} AS cid,
             list_aggregate(list_transform(e6, x -> x * x), 'sum') AS n2
      FROM m),
p AS (SELECT DISTINCT b.vec_id AS v2
      FROM v a JOIN v b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE CAST(list_aggregate(list_transform(range(1, {_KM_DIM + 1}),
                   i -> a.e6[i] * b.e6[i]), 'sum') AS DOUBLE)
              / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE)))
            >= {_SEM_T})
SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cluster_id,
       (p.v2 IS NOT NULL) AS is_dup
FROM v LEFT JOIN p ON v.vec_id = p.v2
"""


@register("dedup_semantic_clusters", oracle=_semantic_dedup_oracle(), tags=("dedup", "similarity"))
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: assign every vector to a k-means
    cluster (map-only, literal centroids), then mark a vector as a
    duplicate iff some LOWER-id vector in the SAME cluster has cosine >=
    {_SEM_T} — keep-lowest-id semantics, deterministic.  The quadratic
    pair space is confined to single clusters (the SemDeDup trick): the
    equi-join on cluster id shuffles each cluster to one task and the
    global cost is sum(|cluster|^2), not n^2.  At 100 TB the cluster
    count scales with the corpus so |cluster| stays bounded; the
    centroids come from sim_kmeans_train."""
    from copperhead_spark.operators.barrier import project_once
    from copperhead_spark.operators.kmeans import (
        E6_SPARK,
        assign_expr,
        deterministic_centroids,
    )

    cents = deterministic_centroids(_KM_K, _KM_DIM)
    emb = table(spark, sf_dir, "embeddings")
    v = project_once(
        emb, "vec_id", f"{E6_SPARK.format(vec='embedding')} AS e6"
    ).selectExpr(
        "vec_id",
        "e6",
        f"{assign_expr(cents)} AS cid",
        "aggregate(transform(e6, x -> x * x), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS n2",
    )
    a = v.selectExpr("vec_id AS vec1", "e6 AS ea", "cid", "n2 AS na")
    b = v.selectExpr("vec_id AS vec2", "e6 AS eb", "cid", "n2 AS nb")
    dups = (
        a.join(b, ["cid"])
        .filter(F.col("vec1") < F.col("vec2"))
        .selectExpr(
            "vec2",
            "CAST(aggregate(zip_with(ea, eb, (x, y) -> x * y), CAST(0 AS BIGINT),"
            " (acc, v) -> acc + v) AS DOUBLE)"
            " / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cosine",
        )
        .filter(F.col("cosine") >= _SEM_T)
        .select("vec2")
        .distinct()
    )
    return v.join(dups, v.vec_id == dups.vec2, "left").select(
        "vec_id",
        F.col("cid").cast("long").alias("cluster_id"),
        F.col("vec2").isNotNull().alias("is_dup"),
    )


# Product quantization (PQ) ANN — the third scale path besides LSH and
# IVF, and the one that fits 100 TB of vectors in cluster RAM: 64
# float32 dims (256 B) compress to M=16 codeword ids (one per 4-dim
# subspace), and query-time scoring is asymmetric distance computation
# (ADC): the query precomputes a distance table to every codeword, and a
# candidate's approximate distance is M table lookups — the scan never
# touches the vectors.  The full production shape is implemented: ADC
# shortlist (top-S per query, partial per-partition top-S first) ->
# fetch exact vectors for the shortlist only (broadcast join) -> exact
# cosine re-rank -> top-k.  Because embeddings are unit-norm, L2 ADC
# ordering is cosine ordering, so the re-ranked recall equals the
# shortlist recall (0.92 at S=50 on the sf0.01 corpus; sim_pq_recall
# pins it).  Codebooks come from an offline per-subspace k-means; the
# deterministic stand-in draws mix-hash directions scaled to the
# expected subvector norm sqrt(D/64) and ships as literals, so encode +
# ADC are pure projections and every value is bit-equal to the
# self-contained SQL oracle.
# ---------------------------------------------------------------------------

_PQ_M = 16  # subspaces
_PQ_D = 4  # dims per subspace (M * D = 64)
_PQ_K = 16  # codewords per subspace
_PQ_S = 50  # ADC shortlist depth per query (the recall knob)


def _pq_codebooks() -> list[list[list[int]]]:
    """codebooks[m][j] = micro-int codeword (len _PQ_D) for subspace m,
    codeword j: mix-hash direction (functions/hashing — a plain affine
    formula makes codewords collinear translates, which collapses every
    vector to one code), normalized to the expected subvector norm
    sqrt(D/64) of a unit vector."""
    import math

    from copperhead_spark.functions.hashing import MIX_P, mix_py

    scale = math.sqrt(_PQ_D / 64.0)
    books = []
    for m in range(_PQ_M):
        row = []
        for j in range(_PQ_K):
            v = [
                mix_py(1 + i + _PQ_D * j + _PQ_D * _PQ_K * m, 7) / MIX_P * 2 - 1
                for i in range(_PQ_D)
            ]
            norm = math.sqrt(sum(x * x for x in v))
            row.append([round(x / norm * scale * 1_000_000) for x in v])
        books.append(row)
    return books


def _pq_dist_spark(m: int, cw: list[int], e6: str = "e6") -> str:
    """int64 squared L2 distance between subvector m of ``e6`` and a
    literal codeword (Spark dialect)."""
    lits = ", ".join(str(c) for c in cw)
    return (
        f"aggregate(zip_with(slice({e6}, {m * _PQ_D + 1}, {_PQ_D}), array({lits}),"
        f" (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _pq_dist_duck(m: int, cw: list[int], e6: str = "e6") -> str:
    lits = ", ".join(str(c) for c in cw)
    return (
        f"list_aggregate(list_transform(range(1, {_PQ_D + 1}),"
        f" i -> ({e6}[{m * _PQ_D} + i] - ([{lits}])[i])"
        f" * ({e6}[{m * _PQ_D} + i] - ([{lits}])[i])), 'sum')"
    )


def _pq_codes_spark(books: list[list[list[int]]]) -> str:
    """array<int> of per-subspace argmin codeword ids (ties -> lowest id)."""
    subs = []
    for m in range(_PQ_M):
        entries = ", ".join(
            f"struct({_pq_dist_spark(m, cw)} AS d, {j} AS c)"
            for j, cw in enumerate(books[m])
        )
        subs.append(f"array_min(array({entries})).c")
    return f"array({', '.join(subs)})"


def _pq_codes_duck(books: list[list[list[int]]]) -> str:
    subs = []
    for m in range(_PQ_M):
        entries = ", ".join(
            f"{{'d': {_pq_dist_duck(m, cw)}, 'c': {j}}}"
            for j, cw in enumerate(books[m])
        )
        subs.append(f"(list_min([{entries}])).c")
    return f"[{', '.join(subs)}]"


def _pq_dtab_spark(books: list[list[list[int]]]) -> str:
    """array<array<bigint>>: dtab[m][j] = dist(query subvector m, codeword j)."""
    rows = [
        f"array({', '.join(_pq_dist_spark(m, cw) for cw in books[m])})"
        for m in range(_PQ_M)
    ]
    return f"array({', '.join(rows)})"


def _pq_dtab_duck(books: list[list[list[int]]]) -> str:
    rows = [
        f"[{', '.join(_pq_dist_duck(m, cw) for cw in books[m])}]"
        for m in range(_PQ_M)
    ]
    return f"[{', '.join(rows)}]"


def _pq_oracle() -> str:
    books = _pq_codebooks()
    n2 = "list_aggregate(list_transform(e6, x -> x * x), 'sum')"
    qdot = "list_aggregate(list_transform(range(1, 65), i -> qe[i] * ce[i]), 'sum')"
    return f"""
WITH m AS (
  SELECT vec_id, {_E6_DUCK} AS e6 FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, {_pq_dtab_duck(books)} AS dtab,
         e6 AS qe, {n2} AS qn
  FROM m WHERE vec_id < {_NQ}
),
c AS (
  SELECT vec_id AS cand_id, {_pq_codes_duck(books)} AS codes,
         e6 AS ce, {n2} AS cn
  FROM m WHERE vec_id >= {_NQ}
),
scored AS (
  SELECT query_id, cand_id, qe, qn, ce, cn,
         list_aggregate(list_transform(range(0, {_PQ_M}),
           mm -> dtab[mm + 1][codes[mm + 1] + 1]), 'sum') AS adc
  FROM q, c
),
short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc ASC, cand_id ASC
    ) AS srn FROM scored
  ) WHERE srn <= {_PQ_S}
),
rr AS (
  SELECT query_id, cand_id,
         CAST({qdot} AS DOUBLE)
           / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine
  FROM short
)
SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
  ) AS rn FROM rr
) WHERE rn <= {_TOPK}
"""


@register("sim_pq_topk", oracle=_pq_oracle(), tags=("similarity",))
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN with exact re-rank: candidates encode to {_PQ_M} codeword ids
    (a pure projection against literal codebooks — the scan reads codes,
    not vectors: 32x less data), each query's distance table constant-
    folds into the scan (queries always broadcast), ADC = {_PQ_M} array
    lookups.  The shortlist is a two-stage top-{_PQ_S}: per-partition
    partial first, so the shuffle carries O(parts * nq * S) rows, never
    the candidate set.  Only the shortlist joins back to the vector
    table (broadcast hash join) for the exact-cosine re-rank.  All
    integer arithmetic -> bit-equal to the SQL oracle."""
    from copperhead_spark.operators.barrier import project_once

    books = _pq_codebooks()
    emb = table(spark, sf_dir, "embeddings")
    base = project_once(emb, "vec_id", f"{_E6_SPARK} AS e6")
    n2 = "aggregate(transform(e6, x -> x * x), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    # driver boundary: nq rows of (distance table, exact query vector)
    qrows = (
        base.filter(F.col("vec_id") < _NQ)
        .selectExpr(
            "vec_id AS query_id",
            f"{_pq_dtab_spark(books)} AS dtab",
            "e6 AS qe",
            f"{n2} AS qn",
        )
        .collect()
    )
    c = base.filter(F.col("vec_id") >= _NQ).selectExpr(
        "vec_id AS cand_id", f"{_pq_codes_spark(books)} AS codes"
    )
    entries = []
    for r in sorted(qrows, key=lambda r: r.query_id):
        dtab_lit = ", ".join(
            "array(" + ", ".join(f"CAST({v} AS BIGINT)" for v in row) + ")"
            for row in r.dtab
        )
        adc = (
            f"aggregate(sequence(0, {_PQ_M - 1}), CAST(0 AS BIGINT), (acc, mm) -> "
            f"acc + element_at(element_at(array({dtab_lit}), mm + 1),"
            f" element_at(codes, mm + 1) + 1))"
        )
        entries.append(
            f"struct(CAST({r.query_id} AS BIGINT) AS query_id, {adc} AS adc)"
        )
    scored = c.selectExpr(
        "cand_id", f"inline(array({', '.join(entries)}))"
    ).select("query_id", "cand_id", "adc")
    # top-S per query in ONE window: rank-limit pushdown
    # (WindowGroupLimit) prunes each map partition to its local top-S
    # below the exchange, so only O(parts * nq * S) partials shuffle —
    # the old explicit (query_id, spark_partition_id()) pre-window
    # duplicated that prune at the cost of a second full
    # Exchange+Sort+Window (r12; rows identical, total order per query)
    wg = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("cand_id").asc()
    )
    short = (
        scored.withColumn("srn", F.row_number().over(wg))
        .filter(F.col("srn") <= _PQ_S)
        .select("query_id", "cand_id")
    )
    # exact vectors for the shortlist only
    qdf = spark.createDataFrame(
        [(int(r.query_id), list(r.qe), int(r.qn)) for r in qrows],
        "query_id bigint, qe array<bigint>, qn bigint",
    )
    rr = (
        base.join(F.broadcast(short), base.vec_id == short.cand_id)
        .join(F.broadcast(qdf), "query_id")
        .selectExpr(
            "query_id",
            "cand_id",
            "CAST(aggregate(zip_with(qe, e6, (x, y) -> x * y), CAST(0 AS BIGINT),"
            " (acc, v) -> acc + v) AS DOUBLE)"
            f" / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST({n2} AS DOUBLE))) AS cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        rr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "cand_id", "cosine", F.col("rn").cast("long").alias("rank"))
    )


def _pq_recall_oracle() -> str:
    return f"""
SELECT e.query_id,
       CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ({_COSINE_TOPK_ORACLE}) e
LEFT JOIN ({_pq_oracle()}) i
  ON e.query_id = i.query_id AND e.cand_id = i.cand_id
GROUP BY e.query_id
"""


@register("sim_pq_recall", oracle=_pq_recall_oracle(), tags=("similarity",))
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k quality gate for the PQ path (same contract as
    sim_ivf_recall): fraction of the exact brute-force top-{_TOPK} the
    shortlist+re-rank pipeline recovers — an exact hashable value
    because both inputs are deterministic integer pipelines.  Floor
    asserted in tests (mean recall >= 0.8 at S={_PQ_S} on sf0.01); raising
    S trades scan cost for recall."""
    exact = sim_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    approx = (
        sim_pq_topk(spark, sf_dir)
        .select("query_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_match"),
            F.count("*").cast("long").alias("k"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*").cast("double")
            ).alias("recall"),
        )
    )

_NEARDUP_BLOCKS = 8


@register("dedup_embedding_cosine_pairs", oracle=_NEARDUP_ORACLE, tags=("dedup", "similarity"))
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (threshold {_NEARDUP_T}) via
    triangle block-partitioning: each vector gets block b = vec_id mod P;
    the left side replicates to block-pair keys (b, j>=b), the right to
    (i<=b, b), and the join is a plain EQUI-join on (bi, bj) — the
    O(n^2) pair compute (irreducible for exact semantics) is spread
    evenly over P(P+1)/2 hash-join tasks with shuffle O(n*P), no
    nested-loop join anywhere.  Every unordered pair meets in exactly one
    task (same-block orientations deduped by va < vb).  The dot products
    run through the vectorized Arrow kernel (functions/vectors.py), and
    the brute-force oracle checks every value.  At 100 TB exact all-pairs
    is still quadratic work by definition — the subquadratic production
    near-dup is dedup_semantic_clusters (pair space confined to k-means
    clusters, sum(|c|^2) not n^2)."""
    from copperhead_spark.functions.vectors import pair_dot

    blocks = _NEARDUP_BLOCKS
    emb = table(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id",
        "embedding",
        f"{_norm2_spark('embedding')} AS n2",
        f"CAST(pmod(vec_id, {blocks}) AS INT) AS blk",
    )
    a = v.selectExpr(
        "vec_id AS va",
        "embedding AS e1",
        "n2 AS na",
        "blk AS bi",
        f"explode(sequence(blk, {blocks - 1})) AS bj",
    )
    b = v.selectExpr(
        "vec_id AS vb",
        "embedding AS e2",
        "n2 AS nb",
        "explode(sequence(0, blk)) AS bi",
        "blk AS bj",
    )
    cand = a.join(b, ["bi", "bj"]).filter("bi < bj OR va < vb")
    scored = pair_dot(cand, "e1", "e2").selectExpr(
        "least(va, vb) AS vec1",
        "greatest(va, vb) AS vec2",
        "CAST(dot AS DOUBLE)"
        " / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cosine",
    )
    return scored.filter(F.col("cosine") >= _NEARDUP_T)


# ---------------------------------------------------------------------------
# kNN label classification: the eval workload over the ANN machinery —
# predict each held-out vector's label by majority vote of its k exact-
# cosine neighbors (deterministic tie-breaks: vote count DESC then label
# ASC), the standard embedding-quality probe a training pipeline runs
# after every re-embed.  Reuses the partial-top-k Arrow kernel, so the
# scan stays the plan that survives a billion candidates.
# ---------------------------------------------------------------------------

_KNN_NQ = 50
_KNN_K = 5

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS true_label, embedding AS qe,
         {_dot_duck("embedding", "embedding")} AS qn
  FROM embeddings WHERE vec_id < {_KNN_NQ}
),
c AS (
  SELECT vec_id AS cand_id, label, embedding AS ce,
         {_dot_duck("embedding", "embedding")} AS cn
  FROM embeddings WHERE vec_id >= {_KNN_NQ}
),
scored AS (
  SELECT query_id, true_label, cand_id, c.label,
         CAST({_dot_duck("qe", "ce")} AS DOUBLE)
           / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine
  FROM q, c
),
nn AS (
  SELECT query_id, true_label, label FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
    ) AS rn FROM scored
  ) WHERE rn <= {_KNN_K}
),
votes AS (
  SELECT query_id, true_label, label, CAST(COUNT(*) AS BIGINT) AS n
  FROM nn GROUP BY 1, 2, 3
)
SELECT query_id,
       CAST(true_label AS BIGINT) AS true_label,
       CAST(label AS BIGINT) AS pred_label,
       n AS n_votes
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY n DESC, label ASC
  ) AS vr FROM votes
) WHERE vr = 1
"""


@register("sim_knn_classify", oracle=_KNN_ORACLE, tags=("similarity", "ml"))
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k={_KNN_K} nearest-neighbor label prediction for the {_KNN_NQ}
    held-out vectors: exact-cosine neighbors from the per-batch partial
    top-k kernel, then a vote rollup on the O(nq * k) neighbor rows —
    everything after the scan is window/agg work on a table whose size is
    the query set, not the corpus."""
    from copperhead_spark.functions.vectors import batch_cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < _KNN_NQ)
        .selectExpr("vec_id AS query_id", "embedding")
        .toPandas()
    )
    cands = emb.filter(F.col("vec_id") >= _KNN_NQ).selectExpr(
        "vec_id AS cand_id", "embedding"
    )
    nn = batch_cosine_topk(cands, queries, _KNN_K, score_name="cosine")
    labels = emb.selectExpr("vec_id AS cand_id", "label")
    truth = emb.selectExpr("vec_id AS query_id", "CAST(label AS BIGINT) AS true_label")
    votes = (
        nn.join(F.broadcast(labels), "cand_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("n").desc(), F.col("label").asc())
    pred = (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .selectExpr("query_id", "CAST(label AS BIGINT) AS pred_label", "n AS n_votes")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id", "true_label", "pred_label", "n_votes"
    )


# ---------------------------------------------------------------------------
# E2E vector-index build (IVF + PQ)
# ---------------------------------------------------------------------------

_IXB_HASH_P = 2_147_483_647


def _ann_index_oracle() -> str:
    from copperhead_spark.operators.kmeans import (
        assign_expr_duck,
        deterministic_centroids,
    )

    books = _pq_codebooks()
    cents = deterministic_centroids(_KM_K, _KM_DIM)
    code_hash = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(codes, c -> CAST(c AS BIGINT))),"
        f" (a, c) -> (a * 17 + c) % {_IXB_HASH_P})"
    )
    return f"""
WITH m AS (SELECT vec_id, {_E6_DUCK} AS e6
           FROM embeddings),
ix AS (
  SELECT vec_id,
         {assign_expr_duck(cents)} AS cid,
         {_pq_codes_duck(books)} AS codes
  FROM m
)
SELECT vec_id,
       CAST(cid AS BIGINT) AS cluster_id,
       {code_hash} AS code_hash,
       CAST(COUNT(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_size
FROM ix
"""


@register(
    "pipeline_ann_index_build",
    oracle=_ann_index_oracle(),
    tags=("similarity", "pipeline"),
)
def pipeline_ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2E vector-index build — the offline half of the ANN story whose
    online halves are sim_ivf_topk (coarse probe) and sim_pq_topk (ADC
    scan): every vector gets its IVF coarse cell (argmin vs literal
    centroids) AND its {_PQ_M}-byte PQ code (argmin per subspace vs
    literal codebooks) in ONE map-only projection — zero shuffles to
    build the index payload, which is how 100 TB of vectors index in a
    single pass.  The only exchange is the per-cell size rollup (the
    stats a query planner needs to pick nprobe).  Codes fold to an
    order-sensitive hash so the oracle pins every codeword id
    bit-exactly.  Reference analogue: none (beyond-reference retrieval
    infrastructure)."""
    from copperhead_spark.operators.barrier import project_once
    from copperhead_spark.operators.kmeans import deterministic_centroids
    books = _pq_codebooks()
    cents = deterministic_centroids(_KM_K, _KM_DIM)
    emb = table(spark, sf_dir, "embeddings")
    v = project_once(emb, "vec_id", f"{_E6_SPARK} AS e6")
    # Arrow kernel build (operators/pq.py): same exact int64 argmins as
    # the expression twins, vectorized — HOF lambdas are interpreted, so
    # at ~1500 int ops/vector the kernel is the form that scales (the
    # DuckDB oracle still replays the expression arithmetic, so kernel
    # drift hash-fails)
    ix = ivf_pq_index_arrow(v, cents, books)
    code_hash = (
        f"aggregate(codes, CAST(0 AS BIGINT),"
        f" (a, c) -> pmod(a * 17 + CAST(c AS BIGINT), {_IXB_HASH_P}))"
    )
    # materialize the index payload ONCE: both the sizes rollup and the
    # final join consume ix, and without truncation Catalyst re-runs the
    # scan -> e6 -> assign -> encode pipeline for each consumer (no CSE
    # across consumers — ARCHITECTURE.md lineage-truncation pattern; on
    # a real cluster this is the index table's parquet write).
    ix = ix.localCheckpoint()
    # per-cell sizes as a partial-aggregated K-row table broadcast back:
    # a window over partitionBy(cid) would funnel ALL index rows through
    # K={_KM_K} tasks — the skew the docstring forbids
    sizes = ix.groupBy("cid").agg(F.count("*").cast("long").alias("cluster_size"))
    return ix.join(F.broadcast(sizes), "cid").select(
        "vec_id",
        F.col("cid").cast("long").alias("cluster_id"),
        F.expr(code_hash).alias("code_hash"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# ANN end-to-end: query THROUGH the built index (build -> coarse probe ->
# ADC scan over stored codes -> exact re-rank -> recall gate, one plan)
# ---------------------------------------------------------------------------

_E2E_NPROBE = 4  # coarse cells probed per query (recall knob #1)


def _km_probes_spark(cents: list[list[int]], nprobe: int, e6: str = "e6") -> str:
    """top-nprobe centroid ids by exact int64 squared L2 distance (the
    SAME metric assign_expr indexes with — probing by a different metric
    than the one that built the cells silently costs recall), ties ->
    lowest cid."""
    entries = ", ".join(
        f"struct(aggregate(zip_with({e6}, array({', '.join(str(c) for c in cent)}),"
        f" (x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d,"
        f" {cid} AS c)"
        for cid, cent in enumerate(cents)
    )
    return f"transform(slice(array_sort(array({entries})), 1, {nprobe}), x -> x.c)"


def _km_probes_duck(cents: list[list[int]], nprobe: int, e6: str = "e6") -> str:
    dim = len(cents[0])
    entries = ", ".join(
        f"{{'d': list_aggregate(list_transform(range(1, {dim + 1}),"
        f" i -> ({e6}[i] - ([{', '.join(str(c) for c in cent)}])[i])"
        f" * ({e6}[i] - ([{', '.join(str(c) for c in cent)}])[i])), 'sum'),"
        f" 'c': {cid}}}"
        for cid, cent in enumerate(cents)
    )
    return f"(list_transform(list_sort([{entries}]), x -> x.c))[1:{nprobe}]"


def _ann_e2e_oracle() -> str:
    from copperhead_spark.operators.kmeans import (
        assign_expr_duck,
        deterministic_centroids,
    )

    books = _pq_codebooks()
    cents = deterministic_centroids(_KM_K, _KM_DIM)
    n2 = "list_aggregate(list_transform(e6, x -> x * x), 'sum')"
    qdot = "list_aggregate(list_transform(range(1, 65), i -> qe[i] * ce[i]), 'sum')"
    return f"""
WITH m AS (SELECT vec_id, {_E6_DUCK} AS e6 FROM embeddings),
ix AS (
  SELECT vec_id AS cand_id,
         {assign_expr_duck(cents)} AS cid,
         {_pq_codes_duck(books)} AS codes,
         e6 AS ce, {n2} AS cn
  FROM m WHERE vec_id >= {_NQ}
),
q AS (
  SELECT vec_id AS query_id,
         {_pq_dtab_duck(books)} AS dtab,
         e6 AS qe, {n2} AS qn,
         unnest({_km_probes_duck(cents, _E2E_NPROBE)}) AS cid
  FROM m WHERE vec_id < {_NQ}
),
scored AS (
  SELECT query_id, cand_id, qe, qn, ce, cn,
         list_aggregate(list_transform(range(0, {_PQ_M}),
           mm -> dtab[mm + 1][codes[mm + 1] + 1]), 'sum') AS adc
  FROM q JOIN ix USING (cid)
),
short AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc ASC, cand_id ASC
    ) AS srn FROM scored
  ) WHERE srn <= {_PQ_S}
),
topk AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY
        CAST({qdot} AS DOUBLE)
          / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) DESC,
        cand_id ASC
    ) AS rn FROM short
  ) WHERE rn <= {_TOPK}
),
exact AS ({_COSINE_TOPK_ORACLE})
SELECT e.query_id,
       CAST(SUM(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(SUM(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS recall
FROM exact e
LEFT JOIN topk t ON e.query_id = t.query_id AND e.cand_id = t.cand_id
GROUP BY e.query_id
"""


@register(
    "pipeline_ann_query_e2e",
    oracle=_ann_e2e_oracle(),
    tags=("similarity", "pipeline"),
)
def pipeline_ann_query_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shape a real vector store runs, in ONE plan: (1) OFFLINE the
    index table materializes — every candidate's IVF cell + {_PQ_M}-byte
    PQ code, the same map-only build as pipeline_ann_index_build,
    truncated with localCheckpoint (= the index table's parquet write on
    a cluster); (2) ONLINE each query computes its distance table and
    its {_E2E_NPROBE} nearest cells against the SAME centroids the build
    used, joins candidates FROM THE BUILT TABLE on cell id (the probe
    reads codes, never raw vectors — 32x less data scanned), ranks by
    ADC ({_PQ_M} array lookups per candidate), shortlists top-{_PQ_S}
    per query two-stage (partition-local then global, so the shuffle
    carries O(parts * nq * S) rows); (3) only the shortlist joins back
    to the vector table for the exact-cosine top-{_TOPK}; (4) the
    recall\\@k gate vs the brute-force oracle-checked exact top-k is IN
    the result, so index-quality regressions hash-fail the driver gate
    (floor asserted in tests/test_round4_regressions.py).  All integer
    arithmetic -> bit-equal to the SQL oracle replaying the same index.
    Reference analogue: none (beyond-reference retrieval
    infrastructure)."""
    from copperhead_spark.operators.barrier import project_once
    from copperhead_spark.operators.kmeans import deterministic_centroids

    books = _pq_codebooks()
    cents = deterministic_centroids(_KM_K, _KM_DIM)
    emb = table(spark, sf_dir, "embeddings")
    # r12: NO eager materialization inside the query — the e2e is one
    # composed pipeline (build + one query batch), so streaming the
    # index build inline is exactly one pass over the vectors, while the
    # two localCheckpoints it used to carry cost three sequential driver
    # round-trips before the plan even started (measured 7.4 -> 4.6 s
    # wall, 12.9 -> 7.0 CPU s at sf0.1; results bit-identical).  The
    # e6 projection is referenced by four subtrees and recomputed per
    # subtree, which is cheaper than materialize+re-read at every scale
    # where the subtrees parallelize; a STANDING index for repeated
    # query batches is pipeline_ann_index_build's job (on a cluster:
    # its parquet write, which query batches then scan).
    base = project_once(emb, "vec_id", f"{_E6_SPARK} AS e6")
    n2 = "aggregate(transform(e6, x -> x * x), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    # ---- offline: the index table (cell id + PQ codes per candidate,
    # Arrow kernel build — see pipeline_ann_index_build) ----
    ix = ivf_pq_index_arrow(base.filter(F.col("vec_id") >= _NQ), cents, books)
    # ---- online: probe the built table ----
    q = base.filter(F.col("vec_id") < _NQ).selectExpr(
        "vec_id AS query_id",
        f"{_pq_dtab_spark(books)} AS dtab",
        "e6 AS qe",
        f"{n2} AS qn",
        f"explode({_km_probes_spark(cents, _E2E_NPROBE)}) AS cid",
    )
    scored = (
        ix.join(F.broadcast(q), "cid")
        .selectExpr(
            "query_id",
            "vec_id AS cand_id",
            "aggregate(zip_with(codes, dtab, (c, dr) -> element_at(dr, c + 1)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS adc",
        )
    )
    # top-S per query: Spark's rank-limit pushdown (WindowGroupLimit,
    # default-on for row_number()<=k) already prunes each MAP partition
    # to its local top-S below the exchange, so the shuffle carries only
    # O(parts * nq * S) partials — exactly what the old explicit
    # (query_id, spark_partition_id()) pre-window did, except that form
    # cost a SECOND full Exchange+Sort+Window of the candidate set
    # (r12: plan audit showed both exchanges carrying all probed rows).
    # Identical rows: (adc, cand_id) is a total order per query, so the
    # local prune can never evict a global top-S member.
    wg = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("cand_id").asc()
    )
    short = (
        scored.withColumn("srn", F.row_number().over(wg))
        .filter(F.col("srn") <= _PQ_S)
        .select("query_id", "cand_id")
    )
    # exact re-rank: shortlist + query vectors broadcast against the
    # vector table (the only touch of raw candidate vectors post-probe)
    qvec = base.filter(F.col("vec_id") < _NQ).selectExpr(
        "vec_id AS query_id", "e6 AS qe", f"{n2} AS qn"
    )
    rr = (
        base.join(F.broadcast(short), base.vec_id == short.cand_id)
        .join(F.broadcast(qvec), "query_id")
        .selectExpr(
            "query_id",
            "cand_id",
            "CAST(aggregate(zip_with(qe, e6, (x, y) -> x * y), CAST(0 AS BIGINT),"
            " (acc, v) -> acc + v) AS DOUBLE)"
            f" / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST({n2} AS DOUBLE))) AS cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    topk = (
        rr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    exact = sim_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    # broadcast the ANN side of the recall join: it is nq x TOPK rows by
    # construction (bounded by the query batch at ANY corpus size), and
    # without the hint the planner ran a SortMergeJoin — two exchanges +
    # sorts of driver-latency-bound row counts (r12 stage probe: this
    # query's wall was 4.6 s against 0.8 s of executor CPU, all stage
    # sequencing).
    return (
        exact.join(F.broadcast(topk), ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_match"),
            F.count("*").cast("long").alias("k"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count("*").cast("double")
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# matryoshka truncation: rank with a prefix of the embedding, measure what
# the truncation loses against the full-dimension ranking
# ---------------------------------------------------------------------------

_MRL_DIM = 16  # ranking prefix (of 64)


def _dot_prefix_spark(a: str, b: str, dim: int) -> str:
    return (
        f"aggregate(zip_with(slice({a}, 1, {dim}), slice({b}, 1, {dim}),"
        f" (x, y) -> {_MICRO_S.format(e='x')} * {_MICRO_S.format(e='y')}),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def _dot_prefix_duck(a: str, b: str, dim: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {dim + 1}), i -> "
        f"{_MICRO_S.format(e=a + '[i]')} * {_MICRO_S.format(e=b + '[i]')}), 'sum')"
    )


_MRL_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_NQ}
),
c AS (
  SELECT vec_id AS cand_id, embedding AS ce FROM embeddings WHERE vec_id >= {_NQ}
),
scored AS (
  SELECT query_id, cand_id,
         CAST({_dot_prefix_duck("qe", "ce", _MRL_DIM)} AS DOUBLE)
           / (SQRT(CAST({_dot_prefix_duck("qe", "qe", _MRL_DIM)} AS DOUBLE))
            * SQRT(CAST({_dot_prefix_duck("ce", "ce", _MRL_DIM)} AS DOUBLE))) AS cos16,
         CAST({_dot_duck("qe", "ce")} AS DOUBLE)
           / (SQRT(CAST({_dot_duck("qe", "qe")} AS DOUBLE))
            * SQRT(CAST({_dot_duck("ce", "ce")} AS DOUBLE))) AS cos64
  FROM q, c
),
ranked AS (
  SELECT query_id, cand_id, cos16,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos16 DESC, cand_id ASC) AS r16,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos64 DESC, cand_id ASC) AS r64
  FROM scored
)
SELECT query_id, CAST(r16 AS BIGINT) AS rank, cand_id, cos16,
       CAST(CASE WHEN r64 <= {_TOPK} THEN 1 ELSE 0 END AS BIGINT) AS in_full_topk
FROM ranked WHERE r16 <= {_TOPK}
"""


@register("emb_matryoshka_topk", oracle=_MRL_ORACLE, tags=("similarity",))
def emb_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix ranking: score with only the first
    {_MRL_DIM} of 64 dimensions (4x less compute and memory bandwidth at
    the coarse stage), and flag which prefix-ranked top-{_TOPK} survive
    in the full-dimension top-{_TOPK} — the truncation-quality audit a
    prefix-trained (MRL) embedding deployment runs before cutting index
    cost.  slice() keeps parquet reads identical; at scale the prefix
    would be a narrower column.  Both cosines are micro-int exact, so
    ranks are engine-deterministic."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NQ).selectExpr("vec_id AS query_id", "embedding AS qe")
    c = emb.filter(F.col("vec_id") >= _NQ).selectExpr("vec_id AS cand_id", "embedding AS ce")
    scored = c.crossJoin(F.broadcast(q)).selectExpr(
        "query_id",
        "cand_id",
        f"CAST({_dot_prefix_spark('qe', 'ce', _MRL_DIM)} AS DOUBLE)"
        f" / (SQRT(CAST({_dot_prefix_spark('qe', 'qe', _MRL_DIM)} AS DOUBLE))"
        f" * SQRT(CAST({_dot_prefix_spark('ce', 'ce', _MRL_DIM)} AS DOUBLE))) AS cos16",
        f"CAST({_dot_spark('qe', 'ce')} AS DOUBLE)"
        f" / (SQRT(CAST({_dot_spark('qe', 'qe')} AS DOUBLE))"
        f" * SQRT(CAST({_dot_spark('ce', 'ce')} AS DOUBLE))) AS cos64",
    )
    w16 = Window.partitionBy("query_id").orderBy(F.col("cos16").desc(), F.col("cand_id").asc())
    w64 = Window.partitionBy("query_id").orderBy(F.col("cos64").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("r16", F.row_number().over(w16))
        .withColumn("r64", F.row_number().over(w64))
        .filter(F.col("r16") <= _TOPK)
        .select(
            "query_id",
            F.col("r16").cast("long").alias("rank"),
            "cand_id",
            "cos16",
            F.when(F.col("r64") <= _TOPK, 1).otherwise(0).cast("long").alias("in_full_topk"),
        )
    )


# ---------------------------------------------------------------------------
# incremental IVF ingest: assign a NEW vector batch to the standing
# centroids without touching (or retraining on) the standing index
# ---------------------------------------------------------------------------

_INC_OFFSET = 1_000_000
# exact in binary, so the perturbed doubles (and their micro-int
# quantization) are bit-identical across engines
_INC_EPS = "0.0009765625"


def _ivf_inc_oracle() -> str:
    cents = _ivf_centroids()
    return f"""
WITH standing AS (
  SELECT {_ivf_assign_duck(cents)} AS cid
  FROM embeddings WHERE vec_id >= {_NQ}
),
batch AS (
  SELECT vec_id + {_INC_OFFSET} AS new_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) + {_INC_EPS}) AS embedding
  FROM embeddings WHERE vec_id % 7 = 3
),
added AS (SELECT {_ivf_assign_duck(cents)} AS cid, new_id FROM batch),
s AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_standing FROM standing GROUP BY cid),
a AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_added, MAX(new_id) AS max_new_id
      FROM added GROUP BY cid)
SELECT COALESCE(s.cid, a.cid) AS cid,
       COALESCE(n_standing, 0) AS n_standing,
       COALESCE(n_added, 0) AS n_added,
       COALESCE(n_standing, 0) + COALESCE(n_added, 0) AS n_total,
       COALESCE(max_new_id, -1) AS max_new_id
FROM s FULL OUTER JOIN a ON s.cid = a.cid
"""


@register("sim_ivf_incremental_add", oracle=_ivf_inc_oracle(), tags=("similarity",))
def sim_ivf_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vector-index ingest: a new batch (deterministically
    perturbed replicas of every 7th vector) is assigned to the STANDING
    centroids map-only — no retraining, no rescan of indexed vectors
    beyond the per-cell count rollup the index metadata already holds.
    This is the streaming-ingest half of a vector store: at 100 TB the
    standing side is a parquet cell-count table and the batch-side
    assignment is embarrassingly parallel, so ingest cost is linear in
    the batch, independent of index size.  Output is per-cell standing /
    added / total counts (integer-exact centroid argmax, so cell
    assignment can never drift between engines)."""
    cents = _ivf_centroids()
    emb = table(spark, sf_dir, "embeddings")
    standing = (
        emb.filter(F.col("vec_id") >= _NQ)
        .selectExpr(f"{_ivf_assign_spark(cents)} AS cid")
        .groupBy("cid")
        .agg(F.count("*").alias("n_standing"))
    )
    batch = emb.filter(F.col("vec_id") % 7 == 3).selectExpr(
        f"vec_id + {_INC_OFFSET} AS new_id",
        f"transform(embedding, x -> CAST(x AS DOUBLE) + {_INC_EPS}) AS embedding",
    )
    added = (
        batch.selectExpr(f"{_ivf_assign_spark(cents)} AS cid", "new_id")
        .groupBy("cid")
        .agg(F.count("*").alias("n_added"), F.max("new_id").alias("max_new_id"))
    )
    return (
        standing.join(added, "cid", "full_outer")
        .select(
            "cid",
            F.coalesce("n_standing", F.lit(0)).alias("n_standing"),
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
            (F.coalesce("n_standing", F.lit(0)) + F.coalesce("n_added", F.lit(0))).alias("n_total"),
            F.coalesce("max_new_id", F.lit(-1)).alias("max_new_id"),
        )
    )


# ---------------------------------------------------------------------------
# filtered ANN (the vector-DB composition every production deployment
# needs: metadata predicate + approximate search).  PRE-filter variant:
# the predicate restricts the candidate set BEFORE the probe join, so
# every query still gets k results from the filtered universe — the
# semantics post-filtering (filter after top-k) cannot guarantee.
# ---------------------------------------------------------------------------

# the metadata constraint under test — a plain comparison, deliberately:
# parquet accepts simple predicates (=, <, IN, IsNotNull) for scan-level
# pushdown; an arithmetic predicate (label % 3 = 0) evaluates in the
# scan stage's FilterExec instead — still before the probe join, but
# without row-group pruning.  Production filtered-ANN schemas put the
# filterable attribute in pushable form (or a partition column).
_FANN_PRED_SQL = "label < 4"


def _filtered_ivf_oracle() -> str:
    cents = _ivf_centroids()
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe,
         {_dot_duck("embedding", "embedding")} AS qn,
         unnest({_ivf_probes_duck(cents)}) AS probe
  FROM embeddings WHERE vec_id < {_NQ}
),
c AS (
  SELECT vec_id AS cand_id, embedding AS ce,
         {_dot_duck("embedding", "embedding")} AS cn,
         {_ivf_assign_duck(cents)} AS cid
  FROM embeddings WHERE vec_id >= {_NQ} AND {_FANN_PRED_SQL}
),
scored AS (
  SELECT query_id, cand_id,
         CAST({_dot_duck("qe", "ce")} AS DOUBLE)
           / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine
  FROM q JOIN c ON q.probe = c.cid
)
SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC
  ) AS rn FROM scored
) WHERE rn <= {_TOPK}
"""


@register(
    "sim_filtered_ivf_topk",
    oracle=_filtered_ivf_oracle(),
    tags=("similarity", "retrieval"),
)
def sim_filtered_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN top-k: sim_ivf_topk's exact plan with a metadata
    predicate ({_FANN_PRED_SQL}) PRE-filtering the candidate side — the
    filter lands in the candidate projection, so Catalyst pushes it to
    the parquet scan (PushedFilters) and the probe join, rerank window,
    and top-k all run on the filtered universe: every query is
    guaranteed k results satisfying the predicate (post-filtering top-k
    output cannot promise that).  This is the composition a production
    vector store runs for every 'search within tenant/category/date'
    request.  Scale: identical to sim_ivf_topk — the predicate only
    SHRINKS the scanned cells; selectivity beyond what nprobe recall
    tolerates is handled by raising nprobe, a literal knob."""
    cents = _ivf_centroids()
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NQ).selectExpr(
        "vec_id AS query_id",
        "embedding AS qe",
        f"{_norm2_spark('embedding')} AS qn",
        f"explode({_ivf_probes_spark(cents)}) AS cid",
    )
    c = (
        emb.filter(F.col("vec_id") >= _NQ)
        .filter(F.expr(_FANN_PRED_SQL))
        .selectExpr(
            "vec_id AS cand_id",
            "embedding AS ce",
            f"{_norm2_spark('embedding')} AS cn",
            f"{_ivf_assign_spark(cents)} AS cid",
        )
    )
    scored = c.join(F.broadcast(q), "cid").selectExpr(
        "query_id",
        "cand_id",
        f"CAST({_dot_spark('qe', 'ce')} AS DOUBLE)"
        " / (SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id", "cand_id", "cosine", F.col("rn").cast("long").alias("rank")
        )
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
