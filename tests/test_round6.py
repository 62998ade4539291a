"""Mirror tests for round-6 operators: pure-Python replays from the raw
parquet so a formula wrong the same way in BOTH engines (Spark builder
and DuckDB oracle share an author) still fails."""

from __future__ import annotations

import math

import duckdb

from copperhead_spark.plans.registry import all_queries

Q = all_queries()


def _df(sf_dir, tbl):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
    ).df()


def _run(spark, sf_dir, name):
    return Q[name].builder(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# GBDT inference: scalar per-row tree walk (no numpy gather, no SQL) must
# reproduce the vectorized kernel's aggregates bit-exactly
# ---------------------------------------------------------------------------


def test_gbdt_mirror_exact(spark, sf_dir):
    from copperhead_spark.ml.gbdt import N_FOLDS, fold_trees

    li = _df(sf_dir, "lineitem")
    models = [fold_trees(k) for k in range(N_FOLDS)]
    agg: dict[tuple[str, int], list] = {}
    for r in li.itertuples():
        x = (
            r.l_quantity / 50.0,
            r.l_discount * 10,
            r.l_tax * 10,
            r.l_extendedprice / 100000.0,
        )
        fold = int(r.l_orderkey) % N_FOLDS
        margin = 0.0
        for tr in models[fold]:
            i = 1
            for _ in range(3):
                i = 2 * i if x[tr["feat"][i - 1]] < tr["thr"][i - 1] else 2 * i + 1
            margin += float(tr["leaf"][i - 8])
        prob = 1.0 / (1.0 + math.exp(-margin))
        key = (r.l_returnflag, fold)
        cur = agg.setdefault(key, [0, 0, 0])
        cur[0] += 1
        cur[1] += int(round(margin * 10_000))  # scale-4 fixed point
        cur[2] += int(round(prob * 10_000))
    got = _run(spark, sf_dir, "ml_gbdt_inference")
    assert len(got) == len(agg)
    for r in got.itertuples():
        n, ms, ps = agg[(r.l_returnflag, r.fold)]
        assert r.n == n
        assert r.margin_sum == ms / 10_000.0
        assert r.prob_sum == ps / 10_000.0
    # folds must actually differ (routing is doing something)
    by_fold = got.groupby("fold").margin_sum.sum()
    assert by_fold.loc[0] != by_fold.loc[1]
