"""Embedding linear-algebra queries: Gram/second-moment matrix and
Johnson-Lindenstrauss random projection.

Beyond-reference capability (LLM-data pipeline): the Gram matrix is the
data pass behind PCA/whitening of an embedding corpus (eigendecompose
the dim x dim result on the driver — it's 32 KB, not data); the signed
random projection is the standard cheap dimensionality reduction used
to shrink vectors before LSH / clustering at scale.

Both are bit-deterministic (exact micro-int fixed point; the JL sign
matrix is a compile-time literal) and full-value oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.operators.linalg import gram_matrix, jl_signs
from copperhead_spark.plans.registry import register

_DIM = 64
_DIM_OUT = 8

_E6_SPARK = (
    "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT))"
)
_E6_DUCK = (
    "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT))"
)

_GRAM_ORACLE = f"""
WITH m AS (SELECT {_E6_DUCK} AS e6 FROM embeddings)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(SUM(e6[i] * e6[j]) AS DOUBLE) / 1e12 AS sum_xy
FROM m, range(1, {_DIM + 1}) r1(i), range(1, {_DIM + 1}) r2(j)
WHERE i <= j
GROUP BY i, j
"""


@register("emb_gram_matrix", oracle=_GRAM_ORACLE, tags=("similarity", "linalg"))
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X^T X over the embedding corpus: per-Arrow-batch int64 numpy
    matmul collapses each batch to a {_DIM}x{_DIM} partial (2080
    upper-triangle rows) inside mapInPandas, then a vocabulary-sized
    groupBy merges partials — the shuffle moves O(partitions * dim^2)
    rows, never O(n).  The oracle's row-explode form is the semantics;
    the matmul form is the scale path."""
    emb = table(spark, sf_dir, "embeddings")
    return gram_matrix(emb, vec_col="embedding", dim=_DIM)


def _proj_exprs(engine: str) -> list[str]:
    signs = jl_signs(_DIM, _DIM_OUT)
    out = []
    for j in range(_DIM_OUT):
        lits = ", ".join(str(s) for s in signs[j])
        if engine == "spark":
            dot = (
                f"aggregate(zip_with(e6, array({lits}), (x, s) -> x * s),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            )
        else:
            dot = (
                f"list_aggregate(list_transform(range(1, {_DIM + 1}),"
                f" i -> e6[i] * ([{lits}])[i]), 'sum')"
            )
        # JL scaling 1/sqrt(dim_out); /1e6 undoes the micro-int scale.
        # sqrt + division are IEEE-exact => bit-identical across engines.
        out.append(
            f"CAST({dot} AS DOUBLE) / 1e6 / SQRT({float(_DIM_OUT)}) AS p{j}"
        )
    return out


def _rp_oracle() -> str:
    cols = ",\n       ".join(_proj_exprs("duck"))
    return f"""
SELECT vec_id,
       {cols}
FROM (SELECT vec_id, {_E6_DUCK} AS e6 FROM embeddings)
"""


@register("emb_random_projection", oracle=_rp_oracle(), tags=("similarity", "linalg"))
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed (JL) random projection {_DIM} -> {_DIM_OUT}: the sign
    matrix is a deterministic compile-time literal, the projection a
    pure per-row expression — zero shuffle, whole-stage codegen, and the
    integer dot products make it bit-exact on both engines."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.selectExpr("vec_id", f"{_E6_SPARK} AS e6").selectExpr(
        "vec_id", *_proj_exprs("spark")
    )


# ---------------------------------------------------------------------------
# per-label centroids (class prototypes)
# ---------------------------------------------------------------------------

_CENT_ORACLE = f"""
WITH m AS (SELECT label, {_E6_DUCK} AS e6 FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(e6[i]) AS DOUBLE) / (COUNT(*) * 1e6) AS centroid
FROM m, range(1, {_DIM + 1}) r(i)
GROUP BY label, i
"""


@register("emb_label_centroids", oracle=_CENT_ORACLE, tags=("similarity", "linalg"))
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes): posexplode the
    micro-int vector, one groupBy(label, dim) integer sum (map-side
    partial agg does the heavy lifting — the exchange carries at most
    labels x {_DIM} x partitions rows), divide back to double at the
    end.  The k x {_DIM} result seeds nearest-class-mean classifiers and
    k-means warm starts; the integer sum makes it bit-deterministic
    under any partitioning.  Reference analogue: none (beyond-reference
    embedding-corpus operator)."""
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    x = emb.selectExpr("label", f"posexplode({_E6_SPARK}) AS (dim0, x)")
    return (
        x.groupBy(F.col("label").cast("long").alias("label"),
                  (F.col("dim0") + 1).cast("long").alias("dim"))
        .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
        .select(
            "label", "dim", "n",
            (F.col("s").cast("double") / (F.col("n") * F.lit(1e6))).alias("centroid"),
        )
    )


# ---------------------------------------------------------------------------
# top eigenvector by power iteration on the exact integer Gram matrix
# ---------------------------------------------------------------------------

_PI_ITERS = 3
_PI_V0 = 1_000_000  # all-ones start vector, 1e6 fixed point


def _pi_oracle() -> str:
    ctes = [
        f"m AS (SELECT {_E6_DUCK} AS e6 FROM embeddings)",
        f"""g AS (
  SELECT i, j, CAST(SUM(e6[i] * e6[j]) AS HUGEINT) AS s
  FROM m, range(1, {_DIM + 1}) r1(i), range(1, {_DIM + 1}) r2(j)
  GROUP BY i, j
)""",
        f"v0 AS (SELECT i, CAST({_PI_V0} AS HUGEINT) AS v"
        f" FROM range(1, {_DIM + 1}) r(i))",
    ]
    sel = []
    for t in range(1, _PI_ITERS + 1):
        ctes.append(
            f"""w{t} AS (
  SELECT g.i, SUM(g.s * v{t - 1}.v) AS w
  FROM g JOIN v{t - 1} ON g.j = v{t - 1}.i GROUP BY g.i
)"""
        )
        ctes.append(f"m{t} AS (SELECT MAX(ABS(w)) AS m FROM w{t})")
        # round-half-away(w * 1e6 / m): nonneg operands in each branch so
        # // (floor) == truncation — engine-portable signed rounding
        ctes.append(
            f"""v{t} AS (
  SELECT i, CASE WHEN w >= 0 THEN (2 * w * 1000000 + m) // (2 * m)
                 ELSE -((-2 * w * 1000000 + m) // (2 * m)) END AS v
  FROM w{t}, m{t}
)"""
        )
        sel.append(
            f"SELECT CAST({t} AS BIGINT) AS iter, CAST(i AS BIGINT) AS dim,"
            f" CAST(v AS BIGINT) AS v_e6 FROM v{t}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)


@register("emb_power_iteration", oracle=_pi_oracle(), tags=("linalg", "iterative"))
def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-eigenvector power iteration on the corpus Gram matrix — the
    data-pass half of PCA/whitening — with the entire trajectory exact:
    the Gram matrix is the e12 integer second-moment sum, each matvec
    runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so no product can
    overflow at any corpus size, and the per-iteration renormalization
    is the signed round-half-away(w * 1e6 / max|w|) from the k-means
    trainer.  Emits the 1e6-scaled vector after each of {_PI_ITERS}
    iterations; the oracle unrolls identical iterations as CTEs and
    matches bit-for-bit.

    Scale design: the only data-sized pass is the Gram build (per-batch
    numpy matmul partials, shuffle O(partitions * dim^2)); the iteration
    then runs on the cached dim x dim matrix — each matvec is a
    {_DIM}-row aggregate, and exactly one {_DIM}-long vector + scalar
    max crosses the driver per iteration (the HITS/k-means loop shape).
    Eigen-iterating driver-side on a 32 KB matrix IS the correct 100 TB
    design; what must be distributed — and is — is the moment sum.

    Reference analogue: none (PCA surface beside emb_gram_matrix /
    emb_random_projection)."""
    from copperhead_spark.operators.kmeans import div_round_half_away
    from copperhead_spark.operators.linalg import gram_matrix_int

    emb = table(spark, sf_dir, "embeddings")
    # r12: collect the dim x dim Gram matrix ONCE and run the matvec
    # loop driver-side in exact Python ints (guide §5 — the driver does
    # no data work, but a 32 KB matrix is not data work: the docstring's
    # own scale design).  The old form re-ran a Spark job per iteration
    # over the checkpointed dim^2-row table — {_PI_ITERS} driver
    # round-trips plus a union + localCheckpoint, all fixed overhead.
    # Python int arithmetic is arbitrary-precision, so SUM(s * v) per
    # row reproduces the DECIMAL(38,0) sums bit-exactly (verified
    # max_abs_diff=0 vs the unrolled-CTE oracle at sf0.01/sf0.1).
    g: dict[tuple[int, int], int] = {}
    for r in gram_matrix_int(emb, "embedding", _DIM).collect():
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        g[(i, j)] = s
        if i != j:
            g[(j, i)] = s
    v = [_PI_V0] * _DIM
    out = []
    for t in range(1, _PI_ITERS + 1):
        w = {
            i: sum(g[(i, j)] * v[j - 1] for j in range(1, _DIM + 1))
            for i in range(1, _DIM + 1)
        }
        m = max(abs(x) for x in w.values())
        v = [div_round_half_away(w[i] * 1_000_000, m) for i in range(1, _DIM + 1)]
        out.extend((t, i, v[i - 1]) for i in range(1, _DIM + 1))
    return spark.createDataFrame(out, "iter long, dim long, v_e6 long")

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
