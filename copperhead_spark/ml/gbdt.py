"""Batched boosted-tree (GBDT) inference (SURVEY.md §2.10 F2 ★): the
reference's stage-2 BDT path runs an XGBoost ``predict_proba`` per
partition with k-fold model routing on the event number
(/root/reference/stage2/mva_evaluators.py:326-369).

Spark-first shape, mirroring ml/inference.py's MLP (F1): the tree
ensemble rides a broadcast variable into an Arrow-batched iterator
pandas UDF; fold routing is a vectorized mask inside the batch, not a
repartition; traversal is vectorized level-by-level over the heap-laid
complete trees (no per-row Python).  XGBoost itself is not in this
image, so the model is a deterministic literal ensemble (K folds x
N_TREES depth-3 trees with fixed split features/thresholds and leaf
values rounded to 4 decimals) — the *operator* under test is broadcast +
batched UDF + fold routing + tree traversal; swap :func:`_margin` for
``xgb.Booster.inplace_predict`` in production.

Cross-engine determinism: traversal is pure comparisons on IEEE-exact
feature expressions and the margin is a left-associated sum of literal
leaf values, so the margin is BIT-IDENTICAL to the oracle's fully
unrolled nested-CASE SQL twin.  Only the logistic link touches libm
(EXP); the query aggregates absorb that at fixed-point scale 4, the same
recipe as the MLP's tanh.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from copperhead_spark.ml.inference import FEATURES

N_FOLDS = 2
N_TREES = 8
DEPTH = 3  # 7 internal nodes, 8 leaves per tree


def fold_trees(fold: int) -> list[dict[str, np.ndarray]]:
    """Deterministic per-fold ensemble.  Heap layout: internal node i in
    1..7 holds (feat[i-1], thr[i-1]); leaves are heap slots 8..15 mapped
    to leaf[i-8].  Thresholds/leaves are rounded to 4 decimals so the
    SQL twin embeds them as exact double literals."""
    rng = np.random.RandomState(4242 + fold)
    trees = []
    for _ in range(N_TREES):
        trees.append(
            {
                "feat": rng.randint(0, len(FEATURES), 7),
                "thr": np.round(rng.uniform(0.0, 1.0, 7), 4),
                "leaf": np.round(rng.uniform(-0.25, 0.25, 8), 4),
            }
        )
    return trees


def _margin(trees: list[dict[str, np.ndarray]], X: np.ndarray) -> np.ndarray:
    """Vectorized ensemble margin: all rows descend each tree level by
    level (gather feat/thr by current heap index), leaf values accumulate
    tree-by-tree (left-assoc, matching the SQL twin's + chain)."""
    n = X.shape[0]
    rows = np.arange(n)
    out = np.zeros(n, dtype=np.float64)
    for tr in trees:
        idx = np.ones(n, dtype=np.int64)
        for _ in range(DEPTH):
            f = tr["feat"][idx - 1]
            left = X[rows, f] < tr["thr"][idx - 1]
            idx = 2 * idx + (~left).astype(np.int64)
        out += tr["leaf"][idx - 8]
    return out


def attach_gbdt_margin(
    df: DataFrame, fold_col: str = "l_orderkey", margin_col: str = "margin"
) -> DataFrame:
    """Batched GBDT inference with fold routing: margin =
    ENSEMBLE_{fold}(features), fold = key % N_FOLDS.  One Arrow-batched
    UDF pass; the ensembles ride a broadcast variable."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast([fold_trees(k) for k in range(N_FOLDS)])
    feats = [name for name, _ in FEATURES]

    @F.pandas_udf("double")
    def gbdt_margin(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        models = bc.value
        for pdf in it:
            X = pdf[feats].to_numpy(dtype=np.float64)
            folds = (pdf["_fold_key"].to_numpy() % N_FOLDS).astype(np.int64)
            out = np.empty(len(pdf), dtype=np.float64)
            for k in range(N_FOLDS):
                mask = folds == k
                if mask.any():
                    out[mask] = _margin(models[k], X[mask])
            yield pd.Series(out)

    with_feats = df.selectExpr(
        "*", *[f"({expr}) AS {name}" for name, expr in FEATURES]
    ).withColumn("_fold_key", F.col(fold_col))
    return with_feats.withColumn(
        margin_col, gbdt_margin(F.struct(*feats, "_fold_key"))
    ).drop(*feats, "_fold_key")


def _tree_sql(tr: dict[str, np.ndarray]) -> str:
    # Thresholds/leaves are emitted as CAST(<literal> AS DOUBLE): DuckDB
    # parses a bare 4-decimal literal as DECIMAL(5,4) and would sum the
    # margin in exact decimal arithmetic, diverging from the numpy float64
    # kernel by ~1 ulp (r6 ADVICE).  Forcing DOUBLE keeps the oracle's
    # margin arithmetic bit-identical to _margin's left-associated float64
    # sum on both engines.
    def node(i: int) -> str:
        if i >= 2**DEPTH:
            return f"CAST({float(tr['leaf'][i - 2**DEPTH])!r} AS DOUBLE)"
        feat_expr = FEATURES[int(tr["feat"][i - 1])][1]
        thr = f"CAST({float(tr['thr'][i - 1])!r} AS DOUBLE)"
        return (
            f"(CASE WHEN ({feat_expr}) < {thr} "
            f"THEN {node(2 * i)} ELSE {node(2 * i + 1)} END)"
        )

    return node(1)


def gbdt_margin_sql(fold_key: str = "l_orderkey") -> str:
    """SQL twin of the fold-routed ensemble margin (runs on both
    engines): CASE on fold, each tree a fully unrolled nested CASE with
    literal thresholds/leaves, trees summed left-associated."""
    branches = []
    for k in range(N_FOLDS):
        expr = " + ".join(_tree_sql(tr) for tr in fold_trees(k))
        branches.append(f"WHEN ({fold_key}) % {N_FOLDS} = {k} THEN ({expr})")
    return "CASE " + " ".join(branches) + " ELSE NULL END"
