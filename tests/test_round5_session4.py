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


# ---------------------------------------------------------------------------
# bitmap segment intersection
# ---------------------------------------------------------------------------


def test_seg_bitmap_mirror_exact(spark, sf_dir):
    c = _df(sf_dir, "customer")
    segs = {
        "building": set(c.c_custkey[c.c_mktsegment == "BUILDING"]),
        "even_key": set(c.c_custkey[c.c_custkey % 2 == 0]),
        "high_bal": set(c.c_custkey[c.c_acctbal > 5000]),
        "low_nation": set(c.c_custkey[c.c_nationkey < 12]),
    }
    names = sorted(segs)
    got = _run(spark, sf_dir, "seg_bitmap_intersect")
    want = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            both = len(segs[a] & segs[b])
            j = (both * 1_000_000) // len(segs[a] | segs[b])
            want[(a, b)] = (len(segs[a]), len(segs[b]), both, j)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.seg_a, r.seg_b)] == (r.n_a, r.n_b, r.n_both, r.jaccard_e6)


# ---------------------------------------------------------------------------
# geo grid radius join
# ---------------------------------------------------------------------------


def test_geo_radius_mirror_exact(spark, sf_dir):
    import numpy as np

    from copperhead_spark.functions.hashing import mix_py
    from copperhead_spark.plans.geo import (
        _GEO_R, _GEO_SALT_X, _GEO_SALT_Y, _GEO_WORLD,
    )

    c = _df(sf_dir, "customer")
    s = _df(sf_dir, "supplier")
    cx = mix_py(c.c_custkey.to_numpy(), _GEO_SALT_X) % _GEO_WORLD
    cy = mix_py(c.c_custkey.to_numpy(), _GEO_SALT_Y) % _GEO_WORLD
    sx = mix_py(s.s_suppkey.to_numpy(), _GEO_SALT_X) % _GEO_WORLD
    sy = mix_py(s.s_suppkey.to_numpy(), _GEO_SALT_Y) % _GEO_WORLD
    ck = c.c_custkey.to_numpy()
    want = {}
    for i, sk in enumerate(s.s_suppkey.to_numpy()):
        d2 = (sx[i] - cx) ** 2 + (sy[i] - cy) ** 2
        m = d2 <= _GEO_R * _GEO_R
        if m.any():
            dmin = int(d2[m].min())
            want[int(sk)] = (
                int(m.sum()),
                dmin,
                int(ck[m][d2[m] == dmin].min()),
            )
    got = _run(spark, sf_dir, "geo_grid_radius_join")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.sk] == (r.n_within, r.min_d2, r.nearest_ck)


# ---------------------------------------------------------------------------
# Markov transitions
# ---------------------------------------------------------------------------


def test_markov_mirror_exact(spark, sf_dir):
    from collections import Counter

    ev = _df(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    row_n = Counter()
    for (a, _), n in trans.items():
        row_n[a] += n
    got = _run(spark, sf_dir, "seq_markov_transitions")
    assert len(got) == len(trans)
    by_src = {}
    for r in got.itertuples():
        assert trans[(r.src, r.dst)] == r.n
        assert (r.n * 1_000_000) // row_n[r.src] == r.p_e6
        by_src.setdefault(r.src, []).append((r.rank, r.n, r.dst))
    # ranks are 1..k per source and ordered by (count desc, dst asc)
    for src, rows in by_src.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-n, d) for _, n, d in rows]
        assert keys == sorted(keys)
    # probabilities per source must sum to <= 1e6 (floor rounding)
    for src in row_n:
        tot = sum(
            (trans[(a, b)] * 1_000_000) // row_n[a]
            for (a, b) in trans if a == src
        )
        assert 1_000_000 - len([1 for (a, _) in trans if a == src]) <= tot <= 1_000_000


# ---------------------------------------------------------------------------
# chi-square independence (128-bit integer path)
# ---------------------------------------------------------------------------


def test_chi2_independence_mirror_exact(spark, sf_dir):
    from collections import Counter

    li = _df(sf_dir, "lineitem")
    o = Counter(zip(li.l_returnflag, li.l_linestatus))
    rt = Counter()
    ct = Counter()
    for (f, s), c in o.items():
        rt[f] += c
        ct[s] += c
    n = sum(o.values())
    cells = {}
    for (f, s), c in o.items():
        num = (c * n - rt[f] * ct[s]) ** 2 * 1_000_000  # python bigint: exact
        cells[(f, s)] = (
            c,
            (rt[f] * ct[s] * 100) // n,
            num // (n * rt[f] * ct[s]),
        )
    chi2 = sum(v[2] for v in cells.values())
    r_cells = Counter(f for f, _ in o)
    c_cells = Counter(s for _, s in o)
    dof = (max(r_cells.values()) - 1) * (max(c_cells.values()) - 1)
    got = _run(spark, sf_dir, "dq_chi2_independence")
    assert len(got) == len(cells)
    for r in got.itertuples():
        oo, e2, cc = cells[(r.flag, r.status)]
        assert (r.o, r.e_e2, r.cell_chi2_e6, r.chi2_e6, r.dof) == (
            oo, e2, cc, chi2, dof,
        )


# ---------------------------------------------------------------------------
# gram-matrix power iteration (exact bigint replay)
# ---------------------------------------------------------------------------


def test_power_iteration_mirror_exact(spark, sf_dir):
    import numpy as np

    from copperhead_spark.operators.kmeans import div_round_half_away
    from copperhead_spark.plans.linalg import _DIM, _PI_ITERS, _PI_V0

    emb = _df(sf_dir, "embeddings")
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1e6
    # SQL ROUND: half away from zero
    Xi = (np.sign(X) * np.floor(np.abs(X) + 0.5)).astype(np.int64)
    G = (Xi.T @ Xi).astype(object)  # python ints: no overflow in matvec
    v = np.array([_PI_V0] * _DIM, dtype=object)
    want = {}
    for t in range(1, _PI_ITERS + 1):
        w = G @ v
        m = max(abs(int(x)) for x in w)
        v = np.array(
            [div_round_half_away(int(x) * 1_000_000, m) for x in w], dtype=object
        )
        for i in range(_DIM):
            want[(t, i + 1)] = int(v[i])
    got = _run(spark, sf_dir, "emb_power_iteration")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.iter, r.dim)] == r.v_e6
    # convergence property: successive normalized vectors stop moving
    last = [want[(_PI_ITERS, i + 1)] for i in range(_DIM)]
    prev = [want[(_PI_ITERS - 1, i + 1)] for i in range(_DIM)]
    num = sum(a * b for a, b in zip(last, prev))
    den2 = sum(a * a for a in last) * sum(b * b for b in prev)
    assert num * num * 100 >= den2 * 81  # |cos| > 0.9


# ---------------------------------------------------------------------------
# ACF over zero-filled daily series
# ---------------------------------------------------------------------------


def test_acf_mirror(spark, sf_dir):
    import math

    from copperhead_spark.plans.timeseries import _ACF_MAXLAG

    ev = _df(sf_dir, "events")
    days = ev.ts.dt.floor("D").astype("int64") // 86_400_000_000
    got = _run(spark, sf_dir, "t11_acf_lags")
    want = {}
    for typ in ev.event_type.unique():
        d = days[ev.event_type == typ]
        lo, hi = int(d.min()), int(d.max())
        series = [0] * (hi - lo + 1)
        for dd in d:
            series[int(dd) - lo] += 1
        for lag in range(1, _ACF_MAXLAG + 1):
            x = series[:-lag] if lag else series
            y = series[lag:]
            n = len(x)
            if n == 0:
                continue
            sx, sy = sum(x), sum(y)
            sxy = sum(a * b for a, b in zip(x, y))
            sxx = sum(a * a for a in x)
            syy = sum(b * b for b in y)
            num = n * sxy - sx * sy
            den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            want[(typ, lag)] = (n, num / den)
    assert len(got) == len(want)
    for r in got.itertuples():
        n, acf = want[(r.typ, r.lag)]
        assert r.n == n
        # libm sqrt product order matches; allow 1 ulp of recombination
        assert abs(r.acf - acf) < 1e-12
        assert -1.0 <= r.acf <= 1.0


# ---------------------------------------------------------------------------
# personalized PageRank (exact integer replay)
# ---------------------------------------------------------------------------


def test_ppr_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.graph import (
        _DAMP_DEN, _DAMP_NUM, _PPR_ITERS, _PPR_SEED_MOD, _R0, _SUPP_BASE,
        _TELEPORT,
    )

    con = duckdb.connect()
    e0 = con.execute(
        f"""SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/lineitem.parquet') l
          ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    edges = e0 + [(d, s) for s, d in e0]
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    seeds = [v for v in deg if v % _PPR_SEED_MOD == 0 and v < _SUPP_BASE]
    rank = {v: _R0 for v in seeds}
    for _ in range(_PPR_ITERS):
        contrib = defaultdict(int)
        for s, d in edges:
            if s in rank:
                contrib[d] += rank[s] // deg[s]
        nxt = {d: (_DAMP_NUM * c) // _DAMP_DEN for d, c in contrib.items()}
        for v in seeds:
            nxt[v] = nxt.get(v, 0) + _TELEPORT
        rank = nxt
    got = _run(spark, sf_dir, "graph_personalized_pagerank")
    assert len(got) == len(rank)
    for r in got.itertuples():
        assert rank[r.node] == r.ppr_e6
    # locality property: seed mass dominates — every seed outranks the
    # global median reached node
    vals = sorted(rank.values())
    med = vals[len(vals) // 2]
    assert all(rank[v] >= med for v in seeds)


# ---------------------------------------------------------------------------
# concurrency sweep
# ---------------------------------------------------------------------------


def test_concurrency_sweep_mirror_exact(spark, sf_dir):
    from collections import Counter

    from copperhead_spark.plans.timeseries import _CONC_DUR_US

    ev = _df(sf_dir, "events")
    us = ev.ts.astype("int64")  # datetime64[us] -> microseconds
    got = _run(spark, sf_dir, "t12_concurrency_sweep")
    want = {}
    for typ in ev.event_type.unique():
        t = us[ev.event_type == typ]
        delta = Counter()
        for x in t:
            delta[int(x)] += 1
            delta[int(x) + _CONC_DUR_US] -= 1
        run = 0
        peaks = {}
        for inst in sorted(delta):
            run += delta[inst]
            day = inst // 86_400_000_000
            peaks[day] = max(peaks.get(day, run), run)
        for day, p in peaks.items():
            want[(typ, day)] = p
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.typ, r.day)] == r.day_peak
    # conservation: concurrency returns to zero after the last interval
    assert run == 0


# ---------------------------------------------------------------------------
# sliding distinct-count window
# ---------------------------------------------------------------------------


def test_window_distinct_mirror_exact(spark, sf_dir):
    o = _df(sf_dir, "orders").sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    want = {}
    for _, g in o.groupby("o_custkey"):
        prios = g.o_orderpriority.tolist()
        keys = g.o_orderkey.tolist()
        for i, k in enumerate(keys):
            want[k] = len(set(prios[max(0, i - 4) : i + 1]))
    got = _run(spark, sf_dir, "w10_window_distinct_count")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.o_orderkey] == r.distinct_prio_5


# ---------------------------------------------------------------------------
# confusion F1 (metric math replayed on the shared confusion cells)
# ---------------------------------------------------------------------------


def test_confusion_f1_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.text import _langid_case

    con = duckdb.connect()
    conf = con.execute(
        f"""SELECT lang AS actual, {_langid_case("duck")} AS predicted,
        COUNT(*) AS n FROM read_parquet('{sf_dir}/documents.parquet')
        GROUP BY 1, 2"""
    ).fetchall()
    classes = sorted({a for a, _, _ in conf} | {p for _, p, _ in conf})
    got = _run(spark, sf_dir, "ml_confusion_f1")
    assert sorted(got.cls) == classes
    total = sum(n for _, _, n in conf)
    for r in got.itertuples():
        tp = sum(n for a, p, n in conf if a == r.cls and p == r.cls)
        fp = sum(n for a, p, n in conf if a != r.cls and p == r.cls)
        fn = sum(n for a, p, n in conf if a == r.cls and p != r.cls)
        prec = (tp * 10**6) // (tp + fp) if tp + fp else 0
        rec = (tp * 10**6) // (tp + fn) if tp + fn else 0
        f1 = (2 * prec * rec) // (prec + rec) if prec + rec else 0
        assert (r.tp, r.fp, r.fn, r.prec_e6, r.rec_e6, r.f1_e6) == (
            tp, fp, fn, prec, rec, f1,
        )
        # harmonic mean never exceeds either component
        assert f1 <= max(prec, rec)
        assert tp + fn <= total


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (brute-force replay)
# ---------------------------------------------------------------------------


def test_prefix_filter_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.dedup import _PF_MOD, _PF_T_E6

    d = _df(sf_dir, "documents")
    d = d[d.doc_id % _PF_MOD == 0]
    toks = {int(r.doc_id): set(r.text.split(" ")) for r in d.itertuples()}
    ids = sorted(toks)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            uni = len(toks[a] | toks[b])
            if inter * 1_000_000 >= _PF_T_E6 * uni:
                want[(a, b)] = (inter, (inter * 1_000_000) // uni)
    got = _run(spark, sf_dir, "dedup_prefix_filter_pairs")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.doc1, r.doc2)] == (r.inter, r.jaccard_e6)
        assert r.jaccard_e6 >= _PF_T_E6


# ---------------------------------------------------------------------------
# CUSUM changepoint
# ---------------------------------------------------------------------------


def test_cusum_mirror_exact(spark, sf_dir):
    ev = _df(sf_dir, "events")
    days = ev.ts.dt.floor("D").astype("int64") // 86_400_000_000
    got = _run(spark, sf_dir, "t13_cusum_changepoint")
    want = {}
    for typ in ev.event_type.unique():
        dd = days[ev.event_type == typ]
        lo, hi = int(dd.min()), int(dd.max())
        series = [0] * (hi - lo + 1)
        for x in dd:
            series[int(x) - lo] += 1
        nd = len(series)
        mean_e6 = (sum(series) * 1_000_000) // nd
        sp, runmin, best = 0, 0, (-1, None)
        for i, c in enumerate(series):
            sp += c * 1_000_000 - mean_e6
            runmin = min(runmin, sp)
            cusum = sp - min(0, runmin)
            if cusum > best[0]:
                best = (cusum, lo + i)
        want[typ] = (nd, best[0], best[1])
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.typ] == (r.n_days, r.peak_cusum_e6, r.changepoint_day)
        assert r.peak_cusum_e6 >= 0


# ---------------------------------------------------------------------------
# Theil-Sen trend
# ---------------------------------------------------------------------------


def test_theil_sen_mirror_exact(spark, sf_dir):
    from collections import Counter

    from copperhead_spark.operators.kmeans import div_round_half_away

    ev = _df(sf_dir, "events")
    days = ev.ts.dt.floor("D").astype("int64") // 86_400_000_000
    got = _run(spark, sf_dir, "t14_theil_sen_trend")
    want = {}
    for typ in ev.event_type.unique():
        c = Counter(int(x) for x in days[ev.event_type == typ])
        pts = sorted(c.items())
        slopes = []
        for i, (da, ca) in enumerate(pts):
            for db, cb in pts[i + 1 :]:
                slopes.append(div_round_half_away((cb - ca) * 1_000_000, db - da))
        slopes.sort()
        want[typ] = (len(slopes), slopes[(len(slopes) + 1) // 2 - 1])
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.typ] == (r.n_pairs, r.slope_med_e6)


def test_theil_sen_even_pair_count(spark, tmp_path):
    """Regression (r5 advice): with an EVEN pair count the lower-median
    rank is (np+1) DIV 2, not (np+1)/2 — double division compares an
    integer rank to x.5 and silently returns NULL.  4 days -> C(4,2)=6
    pairs, so this synthetic corpus exercises the even branch the real
    testdata never does."""
    import pandas as pd

    counts = {0: 1, 1: 3, 2: 2, 3: 7}  # day -> event count
    rows = [
        ("A", pd.Timestamp("1970-01-01") + pd.Timedelta(days=d))
        for d, n in counts.items()
        for _ in range(n)
    ]
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["event_id"] = range(len(df))
    df.to_parquet(tmp_path / "events.parquet")
    got = _run(spark, str(tmp_path), "t14_theil_sen_trend")
    # slopes_e6 sorted: [-1e6, 5e5, 2e6, 2e6, 2e6, 5e6]; lower median
    # = rank (6+1) DIV 2 = 3 -> 2_000_000 (NULL before the DIV fix)
    assert got.n_pairs.tolist() == [6]
    assert got.slope_med_e6.tolist() == [2_000_000]


# ---------------------------------------------------------------------------
# deterministic random walks (exact integer replay)
# ---------------------------------------------------------------------------


def test_random_walks_mirror_exact(spark, sf_dir):
    from copperhead_spark.functions.hashing import mix_py
    from copperhead_spark.plans.graph import (
        _SUPP_BASE, _WALK_SALT, _WALK_SEED_MOD, _WALK_STEPS,
    )

    con = duckdb.connect()
    e0 = con.execute(
        f"""SELECT DISTINCT o_custkey AS src, {_SUPP_BASE} + l_suppkey AS dst
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/lineitem.parquet') l
          ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    nbrs = defaultdict(list)
    for s, d in e0:
        nbrs[s].append(d)
        nbrs[d].append(s)
    seeds = sorted(
        v for v in nbrs if v % _WALK_SEED_MOD == 0 and v < _SUPP_BASE
    )
    want = {}
    for w in seeds:
        node = w
        want[(w, 0)] = node
        for t in range(1, _WALK_STEPS + 1):
            node = min(
                nbrs[node],
                key=lambda v: (int(mix_py(node * 131 + t * 17 + v * 7919, _WALK_SALT)), v),
            )
            want[(w, t)] = node
    got = _run(spark, sf_dir, "graph_random_walks")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.walker, r.step)] == r.node
    # every consecutive (node, next) must be a real edge
    traj = {(r.walker, r.step): r.node for r in got.itertuples()}
    for w in seeds:
        for t in range(_WALK_STEPS):
            assert traj[(w, t + 1)] in nbrs[traj[(w, t)]]


# ---------------------------------------------------------------------------
# Merkle reconciliation fingerprints
# ---------------------------------------------------------------------------


def test_merkle_fingerprint_mirror_exact(spark, sf_dir):
    from copperhead_spark.functions.hashing import mix_py
    from copperhead_spark.plans.relational_ext import _FP_SALT_A, _FP_SALT_B

    li = _df(sf_dir, "lineitem")
    inner = mix_py(
        li.l_orderkey.to_numpy() * 7 + li.l_linenumber.to_numpy(), _FP_SALT_A
    )
    rh = mix_py(inner + li.l_quantity.round().astype("int64").to_numpy() * 31,
                _FP_SALT_B)
    month = (li.l_shipdate.dt.year * 100 + li.l_shipdate.dt.month).to_numpy()
    got = _run(spark, sf_dir, "dq_merkle_fingerprint")
    want = {}
    for mo in set(month):
        h = rh[month == mo]
        want[int(mo)] = (
            len(h),
            int(__import__("functools").reduce(lambda a, b: a ^ b, map(int, h))),
            int(sum(int(x) % 999999937 for x in h) % 999999937),
        )
    want[-1] = (
        len(rh),
        int(__import__("functools").reduce(lambda a, b: a ^ b, map(int, rh))),
        int(sum(int(x) % 999999937 for x in rh) % 999999937),
    )
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.month] == (r.n_rows, r.xor_fp, r.sum_fp)
    # tamper sensitivity: flipping one row's quantity changes the total
    rh2 = rh.copy()
    rh2[0] = int(
        mix_py(inner[0] + (int(li.l_quantity.round().iloc[0]) + 1) * 31, _FP_SALT_B)
    )
    assert (
        int(__import__("functools").reduce(lambda a, b: a ^ b, map(int, rh2)))
        != want[-1][1]
    )


# ---------------------------------------------------------------------------
# ridge regression (exact bigint replay + shrinkage property)
# ---------------------------------------------------------------------------


def test_ridge_fit_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.mltrain import _RIDGE_LAMBDA

    li = _df(sf_dir, "lineitem")
    x1 = li.l_quantity.round().astype("int64")
    x2 = (li.l_discount * 100).round().astype("int64")
    y = (li.l_extendedprice * 100).round().astype("int64")
    a11 = int((x1 * x1).sum())
    a12 = int((x1 * x2).sum())
    a22 = int((x2 * x2).sum())
    b1 = int((x1 * y).sum())
    b2 = int((x2 * y).sum())
    det = (a11 + _RIDGE_LAMBDA) * (a22 + _RIDGE_LAMBDA) - a12 * a12
    num1 = (a22 + _RIDGE_LAMBDA) * b1 - a12 * b2
    num2 = (a11 + _RIDGE_LAMBDA) * b2 - a12 * b1

    def beta(num):
        return (num * 10**9) // det if num >= 0 else -((-num * 10**9) // det)

    got = _run(spark, sf_dir, "ml_ridge_fit")
    assert len(got) == 1
    r = next(got.itertuples())
    assert (r.n, r.a11, r.a12, r.a22, r.b1, r.b2) == (
        len(li), a11, a12, a22, b1, b2,
    )
    assert (r.beta1_e9, r.beta2_e9) == (beta(num1), beta(num2))
    # shrinkage: a much larger lambda pulls both coefficients toward 0
    lam = _RIDGE_LAMBDA * 10**6
    det_l = (a11 + lam) * (a22 + lam) - a12 * a12
    s1 = ((a22 + lam) * b1 - a12 * b2) * 10**9 // det_l
    assert abs(s1) <= abs(r.beta1_e9)


# ---------------------------------------------------------------------------
# two-phase exact P99
# ---------------------------------------------------------------------------


def test_two_phase_p99_mirror_exact(spark, sf_dir):
    li = _df(sf_dir, "lineitem")
    got = _run(spark, sf_dir, "a21_two_phase_p99")
    want = {}
    for flag, sub in li.groupby("l_returnflag"):
        v = sorted((sub.l_extendedprice * 100).round().astype("int64"))
        n = len(v)
        k = (99 * n + 99) // 100
        want[flag] = (n, k, v[k - 1])
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.flag] == (r.n, r.k, r.p99_c)
        # at least 99% of values sit at or below the reported P99
        vals = (li.l_extendedprice[li.l_returnflag == r.flag] * 100).round()
        assert (vals <= r.p99_c).mean() >= 0.99


# ---------------------------------------------------------------------------
# diversified top-k
# ---------------------------------------------------------------------------


def test_diversified_topk_mirror_exact(spark, sf_dir):
    from collections import Counter

    c = _df(sf_dir, "customer")
    rows = sorted(
        zip(
            (c.c_acctbal * 100).round().astype("int64"),
            c.c_custkey,
            c.c_nationkey.astype("int64"),
        ),
        key=lambda r: (-r[0], r[1]),
    )
    per_nation = Counter()
    picked = []
    for bal, key, nat in rows:
        if per_nation[nat] < 2:
            per_nation[nat] += 1
            picked.append((key, nat, bal))
        if len(picked) > 10 * 30:
            break
    want = {
        i + 1: t for i, t in enumerate(
            sorted(picked, key=lambda r: (-r[2], r[0]))[:10]
        )
    }
    got = _run(spark, sf_dir, "retrieval_diversified_topk")
    assert len(got) == 10
    for r in got.itertuples():
        assert want[r.rank] == (r.c_custkey, r.c_nationkey, r.bal_c)
    # diversity invariant on the result itself
    assert max(Counter(got.c_nationkey).values()) <= 2


# ---------------------------------------------------------------------------
# DFA funnel (greedy replay + greedy <= optimal property)
# ---------------------------------------------------------------------------


def test_dfa_funnel_mirror_exact(spark, sf_dir):
    from collections import Counter

    from copperhead_spark.plans.sessions import _DFA_GAP_US, _DFA_STEPS

    ev = _df(sf_dir, "events").sort_values(["ts", "event_id"])
    us = ev.ts.astype("int64")
    streams = {}
    for uid, typ, t in zip(ev.user_id, ev.event_type, us):
        streams.setdefault(int(uid), []).append((str(typ), int(t)))

    def greedy(seq):
        state, last = 0, -1
        for typ, t in seq:
            if state < len(_DFA_STEPS) and typ == _DFA_STEPS[state] and (
                state == 0 or (t > last and t <= last + _DFA_GAP_US)
            ):
                state, last = state + 1, t
        return state

    def optimal(seq):
        # try every event of step 0 as the anchor
        best = 0
        n = len(_DFA_STEPS)
        for i, (typ, t) in enumerate(seq):
            if typ != _DFA_STEPS[0]:
                continue
            state, last = 1, t
            for typ2, t2 in seq[i + 1 :]:
                if state < n and typ2 == _DFA_STEPS[state] and t2 > last and (
                    t2 <= last + _DFA_GAP_US
                ):
                    state, last = state + 1, t2
            best = max(best, state)
            if best == n:
                break
        return best

    stages = Counter(greedy(s) for s in streams.values())
    got = _run(spark, sf_dir, "seq_dfa_funnel")
    assert len(got) == len(stages)
    for r in got.itertuples():
        assert stages[r.stage] == r.n_users
    # the anchored-greedy choice can only under-count vs optimal anchors
    for s in streams.values():
        assert greedy(s) <= optimal(s)


# ---------------------------------------------------------------------------
# snapshot time travel
# ---------------------------------------------------------------------------


def test_snapshot_time_travel_mirror_exact(spark, sf_dir):
    o = _df(sf_dir, "orders")
    total1 = int((o.o_totalprice * 100).round().astype("int64").sum())
    n_f = int((o.o_orderstatus == "F").sum())
    got = _run(spark, sf_dir, "s21_snapshot_time_travel").set_index("gen")
    assert got.loc[1].n_rows == len(o) and got.loc[2].n_rows == len(o)
    assert got.loc[1].total_c == total1
    assert got.loc[2].total_c == total1 + 1000 * n_f
    assert got.loc[1].rows_changed_vs_prev == 0
    assert got.loc[2].rows_changed_vs_prev == n_f
