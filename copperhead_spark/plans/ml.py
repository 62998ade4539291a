"""ML inference query (SURVEY.md §2.10 F1/F2 ★): the Arrow-batched
pandas-UDF MLP with k-fold routing, checked against a fully-unrolled SQL
twin of the same network on DuckDB.  This is the strongest available
check of the UDF path: broadcast weights + batch iteration + fold mask
must reproduce the closed-form expression to libm-ulp level (absorbed by
fixed-point rounding at scale 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.ml.inference import attach_scores, mlp_score_sql
from copperhead_spark.plans.registry import register

_ML_ORACLE = f"""
SELECT l_returnflag,
       CAST(l_orderkey % 2 AS BIGINT) AS fold,
       COUNT(*) AS n,
       {exact_sum_sql(mlp_score_sql(), 4)} AS score_sum
FROM lineitem
GROUP BY 1, 2
"""


@register("ml_mlp_inference", oracle=_ML_ORACLE, tags=("F1", "F2", "ml"))
def ml_mlp_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched DNN-style inference with fold routing
    (mva_evaluators.py:141-195): pandas UDF + broadcast weights on the
    Spark side; the oracle evaluates the identical network as SQL."""
    li = table(spark, sf_dir, "lineitem")
    scored = attach_scores(li, fold_col="l_orderkey", score_col="score")
    return scored.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 2).cast("long").alias("fold")
    ).agg(
        F.count("*").alias("n"),
        exact_sum(F.col("score"), 4).alias("score_sum"),
    )
