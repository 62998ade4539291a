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
