"""Mirror tests for the session-4 round-5 operators: pure-Python/numpy
replays from the raw parquet, so a formula wrong the same way in BOTH
engines (Spark builder and DuckDB oracle share an author) still fails.

All pipelines in this batch are integer fixed-point end to end, so every
comparison is BIT-EXACT."""

from __future__ import annotations

from collections import defaultdict

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
# exact AUC by rank-sum
# ---------------------------------------------------------------------------


def test_auc_rank_mirror_exact(spark, sf_dir):
    o = _df(sf_dir, "orders")
    want = {}
    for grp, sub in o.groupby("o_orderpriority"):
        score = (sub.o_totalprice * 100).round().astype("int64")
        y = (sub.o_orderstatus == "F").astype("int64")
        n = len(sub)
        npos = int(y.sum())
        nneg = n - npos
        if npos == 0 or nneg == 0:
            continue
        # tie-correct average rank, doubled to stay integer
        rank2 = score.rank(method="average") * 2
        u2 = int(rank2[y == 1].sum()) - npos * (npos + 1)
        d = 2 * npos * nneg
        auc_e6 = (u2 // d) * 1_000_000 + ((u2 % d) * 1_000_000) // d
        want[grp] = (n, npos, nneg, auc_e6)
        # sanity: AUC must sit in [0, 1e6]
        assert 0 <= auc_e6 <= 1_000_000
    got = _run(spark, sf_dir, "ml_auc_rank")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.grp] == (r.n, r.npos, r.nneg, r.auc_e6)


# ---------------------------------------------------------------------------
# leave-one-out target encoding
# ---------------------------------------------------------------------------


def test_target_encode_loo_mirror_exact(spark, sf_dir):
    li = _df(sf_dir, "lineitem")
    y = (li.l_returnflag == "R").astype("int64")
    n = y.groupby(li.l_suppkey).size()
    s = y.groupby(li.l_suppkey).sum()
    pairs = sorted(set(zip(li.l_suppkey.astype("int64"), y)))
    want = {}
    for cat, yo in pairs:
        nn, ss = int(n[cat]), int(s[cat])
        loo = ((ss - yo) * 10**9) // (nn - 1) if nn > 1 else -1
        smooth = ((ss - yo + 1) * 10**9) // (nn + 1)
        want[(cat, yo)] = (nn, ss, loo, smooth)
    got = _run(spark, sf_dir, "ml_target_encode_loo")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.cat, r.y)] == (r.n, r.s, r.enc_loo_e9, r.enc_smooth_e9)
    # the LOO guard property: both labels of one category bracket the
    # plain mean, and they differ whenever the category is not pure
    by_cat = defaultdict(dict)
    for (cat, yo), (_, _, loo, _) in want.items():
        by_cat[cat][yo] = loo
    for cat, d in by_cat.items():
        if len(d) == 2 and n[cat] > 1:
            assert d[1] <= d[0]  # excluding a positive lowers the mean


# ---------------------------------------------------------------------------
# Pareto frontier
# ---------------------------------------------------------------------------


def test_pareto_frontier_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.windows import _PARETO_BUCKET

    li = _df(sf_dir, "lineitem")
    pts = set(
        zip(
            li.l_returnflag,
            (li.l_extendedprice * 100).round().astype("int64") // _PARETO_BUCKET,
            li.l_quantity.round().astype("int64"),
        )
    )
    want = set()
    for f, p, q in pts:
        dominated = any(
            f2 == f and p2 <= p and q2 >= q and (p2 < p or q2 > q)
            for f2, p2, q2 in pts
        )
        if not dominated:
            want.add((f, p, q))
    got = _run(spark, sf_dir, "o7_pareto_frontier")
    assert set(zip(got.flag, got.price_b, got.qty)) == want
    # frontier shape: within a flag, each costlier frontier point must
    # offer strictly more quantity (else the cheaper one dominates it)
    for f in {f for f, _, _ in want}:
        seq = sorted((p, q) for ff, p, q in want if ff == f)
        qs = [q for _, q in seq]
        assert all(a < b for a, b in zip(qs, qs[1:]))
