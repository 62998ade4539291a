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


# ---------------------------------------------------------------------------
# boosted-tree (GBDT) inference — F2 with a REAL tree-ensemble payload
# ---------------------------------------------------------------------------

# logistic link shared verbatim by both engines; only EXP touches libm and
# the scale-4 fixed-point aggregate absorbs that (the MLP/tanh recipe)
_SIGMOID = "CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + EXP(-({m})))"


def _gbdt_oracle() -> str:
    from copperhead_spark.ml.gbdt import gbdt_margin_sql

    return f"""
WITH scored AS (
  SELECT l_returnflag, l_orderkey % 2 AS fold,
         ({gbdt_margin_sql()}) AS margin
  FROM lineitem
)
SELECT l_returnflag, CAST(fold AS BIGINT) AS fold, COUNT(*) AS n,
       {exact_sum_sql("margin", 4)} AS margin_sum,
       {exact_sum_sql(_SIGMOID.format(m="margin"), 4)} AS prob_sum
FROM scored GROUP BY 1, 2
"""


@register("ml_gbdt_inference", oracle=_gbdt_oracle(), tags=("F2", "ml"))
def ml_gbdt_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched boosted-tree inference with k-fold routing — F2 closed
    with a real tree-ensemble payload (mva_evaluators.py:326-369 runs
    XGBoost predict_proba per partition, fold = event % 4): 2 folds x 8
    depth-3 trees evaluated by a vectorized Arrow-batched kernel
    (ml/gbdt.py), margin -> logistic probability, aggregated per
    (returnflag, fold).  The oracle evaluates the identical ensemble as
    fully unrolled nested-CASE SQL — an independent evaluation strategy,
    so broadcast + batch iteration + fold mask + heap traversal must
    reproduce the closed form bit-exactly (margins are comparison-only;
    the logistic's libm EXP is absorbed at fixed-point scale 4).

    Scale design: inference is embarrassingly map-only — model size is
    the only broadcast (KBs here, MBs for real BDTs), one UDF pass, no
    shuffle before the partial agg.  At 100 TB the same plan holds; the
    per-batch fold mask keeps one model hot per vector lane instead of
    routing rows through a shuffle."""
    from copperhead_spark.ml.gbdt import attach_gbdt_margin

    li = table(spark, sf_dir, "lineitem")
    scored = attach_gbdt_margin(li, fold_col="l_orderkey", margin_col="margin")
    scored = scored.withColumn("prob", F.expr(_SIGMOID.format(m="margin")))
    return scored.groupBy(
        "l_returnflag", (F.col("l_orderkey") % 2).cast("long").alias("fold")
    ).agg(
        F.count("*").alias("n"),
        exact_sum(F.col("margin"), 4).alias("margin_sum"),
        exact_sum(F.col("prob"), 4).alias("prob_sum"),
    )


# ---------------------------------------------------------------------------
# grouped-agg pandas UDF (the true Python-UDAF surface, completing §2.10:
# scalar-iter, mapInPandas, cogrouped applyInPandas, applyInPandasWithState
# and UDTF are registered elsewhere).  The aggregate is the LOWER MEDIAN —
# an order statistic, picked not interpolated, so the result is an exact
# element of the group and bit-equal to the oracle's window form with no
# float tolerance games.
#
# Scale note: a grouped-agg UDF materializes each group in one pandas
# Series, so it requires bounded group sizes (here: per-supplier groups,
# ~n/|suppliers| rows).  For corpus-scale medians over giant groups the
# production path is a8_quantiles (approx_percentile) — this query is the
# UDAF *surface*, value-checked.
# ---------------------------------------------------------------------------

_MEDIAN_ORACLE = """
SELECT l_suppkey, med_price, CAST(n AS BIGINT) AS n
FROM (
  SELECT l_suppkey, l_extendedprice AS med_price,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_suppkey) AS n
  FROM lineitem
)
WHERE rn = (n + 1) // 2
"""


@register("udaf_grouped_median", oracle=_MEDIAN_ORACLE, tags=("F1", "ml", "udaf"))
def udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier lower-median price via a grouped-agg pandas UDF
    (np.partition selection, O(n) per group — not a sort), with the group
    count carried alongside; the oracle computes the same order statistic
    as a ROW_NUMBER window."""
    import numpy as np
    import pandas as pd

    # NB: the module-level `from __future__ import annotations` turns hints
    # into strings, which pandas_udf's type-hint inference resolves against
    # module globals — so the signature is declared hint-free and the eval
    # type forced explicitly
    from pyspark.sql.functions import PandasUDFType

    @F.pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def lower_median(v):
        a = v.to_numpy(dtype=np.float64)
        k = (len(a) - 1) // 2
        return float(np.partition(a, k)[k])

    # Spark refuses to mix a grouped-agg pandas UDF with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count rides along as
    # a second pandas aggregate
    @F.pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def group_count(v):
        return len(v)

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        lower_median(F.col("l_extendedprice")).alias("med_price"),
        group_count(F.col("l_extendedprice")).alias("n"),
    )


# ---------------------------------------------------------------------------
# model-calibration bins (reliability-diagram input): bin scored rows by
# MARGIN (comparison-exact on both engines — the margin is a sum of
# literal leaves, bit-identical by construction, so flooring it into
# bins can never diverge; binning by the logistic PROBABILITY would put
# a libm EXP inside the bin boundary).
# ---------------------------------------------------------------------------

_CAL_BINW = 20  # bin = floor(margin * 20): 0.05-wide margin bins


def _calibration_oracle() -> str:
    from copperhead_spark.ml.gbdt import gbdt_margin_sql

    return f"""
WITH scored AS (
  SELECT CAST(FLOOR(({gbdt_margin_sql()}) * {_CAL_BINW}) AS BIGINT) AS bin,
         ({_SIGMOID.format(m=f"({gbdt_margin_sql()})")}) AS prob,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label
  FROM lineitem
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       {exact_sum_sql("prob", 4)} AS prob_sum
FROM scored GROUP BY bin
"""


@register("ml_calibration_bins", oracle=_calibration_oracle(), tags=("ml", "F2"))
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table for the GBDT scorer: rows bucketed into
    0.05-wide margin bins, per bin the row count, positive-label count
    (l_returnflag = 'R' as the pseudo-label) and the fixed-point sum of
    predicted probabilities — n_pos/n vs prob_sum/n per bin IS the
    calibration curve.  The binning key is the raw margin, bit-identical
    across engines (see module note), so bucket membership is exact;
    only the probability SUM touches libm and it is absorbed at scale 4
    (the gbdt/MLP recipe).  Map-only scoring + one partial-agg groupBy
    on ~tens of bins: the 100 TB eval set crosses the wire as |bins|
    rows."""
    from copperhead_spark.ml.gbdt import attach_gbdt_margin

    li = table(spark, sf_dir, "lineitem")
    scored = attach_gbdt_margin(li, fold_col="l_orderkey", margin_col="margin")
    return (
        scored.selectExpr(
            f"CAST(FLOOR(margin * {_CAL_BINW}) AS BIGINT) AS bin",
            f"({_SIGMOID.format(m='margin')}) AS prob",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("label").cast("long").alias("n_pos"),
            exact_sum(F.col("prob"), 4).alias("prob_sum"),
        )
    )
