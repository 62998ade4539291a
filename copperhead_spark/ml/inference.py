"""Batched ML inference (SURVEY.md §2.10 F1/F2): the reference runs a
torch MLP / XGBoost BDT per partition with k-fold routing on
``event % 4`` (/root/reference/stage2/mva_evaluators.py:141-195,326-369),
standardizing features per fold and arctanh-ing the sigmoid output.

Spark-first shape: an Arrow-batched iterator pandas UDF; model weights
ride a broadcast variable (the reference pickles its lookups/models into
the processor closure — processor.py:751-800); fold routing is a
vectorized mask inside the batch, NOT a repartition.  Torch/XGBoost are
not in this image, so the model is a pure-numpy MLP with deterministic
weights — the *operator* (broadcast + batched UDF + fold routing) is the
thing under test; swap `_forward` for torch/xgb `predict` in production.

tanh is computed as (exp(2x)-1)/(exp(2x)+1) to mirror the SQL oracle's
expression tree (DuckDB 1.0 has no tanh builtin).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HIDDEN = 8
N_FOLDS = 2

# features over lineitem, shared with the SQL twin
FEATURES = [
    ("x0", "l_quantity / CAST(50 AS DOUBLE)"),
    ("x1", "l_discount * 10"),
    ("x2", "l_tax * 10"),
    ("x3", "l_extendedprice / CAST(100000 AS DOUBLE)"),
]


def fold_weights(fold: int) -> dict[str, np.ndarray]:
    """Deterministic per-fold MLP weights (4 -> 8 -> 1), rounded to 4
    decimals so the SQL twin can embed them as exact literals."""
    rng = np.random.RandomState(1337 + fold)
    return {
        "W1": np.round(rng.uniform(-1, 1, (4, N_HIDDEN)), 4),
        "b1": np.round(rng.uniform(-0.5, 0.5, N_HIDDEN), 4),
        "W2": np.round(rng.uniform(-1, 1, N_HIDDEN), 4),
        "b2": np.round(rng.uniform(-0.5, 0.5, 1), 4),
    }


def _forward(w: dict[str, np.ndarray], X: np.ndarray) -> np.ndarray:
    # hidden pre-activation accumulated column-by-column (left-assoc sum,
    # matching the SQL twin's expression order rather than np.dot's
    # pairwise order — keeps cross-engine drift at libm-ulp level only)
    z = np.broadcast_to(w["b1"], (X.shape[0], N_HIDDEN)).copy()
    for i in range(X.shape[1]):
        z += np.outer(X[:, i], w["W1"][i])
    e = np.exp(2.0 * z)
    h = (e - 1.0) / (e + 1.0)
    out = np.full(X.shape[0], w["b2"][0])
    for j in range(N_HIDDEN):
        out += h[:, j] * w["W2"][j]
    return out


def attach_scores(
    df: DataFrame, fold_col: Column | str = "l_orderkey", score_col: str = "score"
) -> DataFrame:
    """Batched inference with fold routing: score = MLP_{fold}(features),
    fold = key % N_FOLDS.  One Arrow-batched UDF pass, weights broadcast."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast([fold_weights(k) for k in range(N_FOLDS)])
    fold_name = fold_col if isinstance(fold_col, str) else "l_orderkey"

    feats = [name for name, _ in FEATURES]

    @F.pandas_udf("double")
    def mlp_score(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        weights = bc.value
        for pdf in it:
            X = pdf[feats].to_numpy(dtype=np.float64)
            folds = (pdf["_fold_key"].to_numpy() % N_FOLDS).astype(np.int64)
            out = np.empty(len(pdf), dtype=np.float64)
            for k in range(N_FOLDS):
                mask = folds == k
                if mask.any():
                    out[mask] = _forward(weights[k], X[mask])
            yield pd.Series(out)

    with_feats = df.selectExpr(
        "*", *[f"({expr}) AS {name}" for name, expr in FEATURES]
    ).withColumn("_fold_key", F.col(fold_name))
    struct_cols = [*feats, "_fold_key"]
    return with_feats.withColumn(
        score_col, mlp_score(F.struct(*struct_cols))
    ).drop(*feats, "_fold_key")


def mlp_score_sql(fold_key: str = "l_orderkey") -> str:
    """SQL twin of the fold-routed MLP score (runs on both engines):
    CASE on fold, fully unrolled tanh network with literal weights."""
    branches = []
    for k in range(N_FOLDS):
        w = fold_weights(k)
        terms = [str(float(w["b2"][0]))]
        for j in range(N_HIDDEN):
            pre = " + ".join(
                f"{float(w['W1'][i, j])} * ({FEATURES[i][1]})" for i in range(4)
            )
            pre = f"({pre} + {float(w['b1'][j])})"
            tanh = f"((EXP(2 * {pre}) - 1) / (EXP(2 * {pre}) + 1))"
            terms.append(f"{float(w['W2'][j])} * {tanh}")
        branches.append(f"WHEN ({fold_key}) % {N_FOLDS} = {k} THEN (" + " + ".join(terms) + ")")
    return "CASE " + " ".join(branches) + " ELSE NULL END"


# ---------------------------------------------------------------------------
# hmm MVA (r11): the stage-2 fold-routed score the reference evaluates
# BETWEEN categorization and histogramming (mva_evaluators.py:141-195;
# postprocessor.py:61-253 bins the score).  fold = event % 4 exactly as
# the reference routes events.  The activation is HARDTANH (clip), not
# tanh: the score feeds a histogram BIN, and min/max/+/* over identical
# doubles is bit-exact across engines where libm's EXP is only ulp-close
# — a boundary event must land in the same bin on both sides.
# ---------------------------------------------------------------------------

N_HMM_FOLDS = 4

# features over the stage-1 survivor table (sel columns; njets is the
# COALESCEd jet count both engines expose)
HMM_FEATURES = [
    ("h0", "mu1_pt / CAST(100 AS DOUBLE)"),
    ("h1", "mu2_pt / CAST(100 AS DOUBLE)"),
    ("h2", "dimuon_mass / CAST(150 AS DOUBLE)"),
    ("h3", "CAST(njets AS DOUBLE) / CAST(6 AS DOUBLE)"),
]


def hmm_fold_weights(fold: int) -> dict[str, np.ndarray]:
    """Deterministic per-fold weights (4 -> 8 -> 1), rounded to 4
    decimals so the SQL twin embeds them as exact literals."""
    rng = np.random.RandomState(2025 + fold)
    return {
        "W1": np.round(rng.uniform(-1, 1, (4, N_HIDDEN)), 4),
        "b1": np.round(rng.uniform(-0.5, 0.5, N_HIDDEN), 4),
        "W2": np.round(rng.uniform(-1, 1, N_HIDDEN), 4),
        "b2": np.round(rng.uniform(-0.5, 0.5, 1), 4),
    }


def _forward_hardtanh(w: dict[str, np.ndarray], X: np.ndarray) -> np.ndarray:
    """Clip-activation forward pass, accumulation order matching the SQL
    twin exactly — the twin's pre-activation is
    ``(((w0*f0 + w1*f1) + w2*f2) + w3*f3) + b1`` with the bias LAST, so
    the bias is added last here too (unlike tanh-MLP's aggregate-absorbed
    ulp, a bin boundary cannot absorb a grouping difference).  +, *, min,
    max only: bit-identical to the SQL expression on both engines."""
    z = np.zeros((X.shape[0], N_HIDDEN))
    for i in range(X.shape[1]):
        z += np.outer(X[:, i], w["W1"][i])
    z += w["b1"]
    h = np.minimum(np.maximum(z, -1.0), 1.0)
    out = np.full(X.shape[0], w["b2"][0])
    for j in range(N_HIDDEN):
        out += h[:, j] * w["W2"][j]
    return out


def attach_hmm_scores(
    df: DataFrame, fold_col: str = "event", score_col: str = "score"
) -> DataFrame:
    """Batched stage-2 MVA inference with event%4 fold routing: one
    Arrow-batched UDF pass, weights broadcast, fold mask vectorized in
    the batch (never a repartition)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        [hmm_fold_weights(k) for k in range(N_HMM_FOLDS)]
    )
    feats = [name for name, _ in HMM_FEATURES]

    @F.pandas_udf("double")
    def hmm_score(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        weights = bc.value
        for pdf in it:
            X = pdf[feats].to_numpy(dtype=np.float64)
            folds = (pdf["_fold_key"].to_numpy() % N_HMM_FOLDS).astype(np.int64)
            out = np.empty(len(pdf), dtype=np.float64)
            for k in range(N_HMM_FOLDS):
                mask = folds == k
                if mask.any():
                    out[mask] = _forward_hardtanh(weights[k], X[mask])
            yield pd.Series(out)

    with_feats = df.selectExpr(
        "*", *[f"({expr}) AS {name}" for name, expr in HMM_FEATURES]
    ).withColumn("_fold_key", F.col(fold_col))
    return with_feats.withColumn(
        score_col, hmm_score(F.struct(*feats, "_fold_key"))
    ).drop(*feats, "_fold_key")


def hmm_mva_sql(fold_key: str = "id") -> str:
    """SQL twin of the fold-routed hardtanh MVA (LEAST/GREATEST clip —
    both Spark SQL and DuckDB evaluate it as exact double min/max)."""
    branches = []
    for k in range(N_HMM_FOLDS):
        w = hmm_fold_weights(k)
        terms = [str(float(w["b2"][0]))]
        for j in range(N_HIDDEN):
            pre = " + ".join(
                f"{float(w['W1'][i, j])} * ({HMM_FEATURES[i][1]})"
                for i in range(4)
            )
            pre = f"({pre} + {float(w['b1'][j])})"
            clip = f"LEAST(GREATEST({pre}, CAST(-1 AS DOUBLE)), CAST(1 AS DOUBLE))"
            terms.append(f"{float(w['W2'][j])} * {clip}")
        branches.append(
            f"WHEN ({fold_key}) % {N_HMM_FOLDS} = {k} THEN ("
            + " + ".join(terms) + ")"
        )
    return "CASE " + " ".join(branches) + " ELSE NULL END"
