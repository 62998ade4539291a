"""Mirror tests for the session-3 round-5 operators: each re-derives the
query's math in pure Python/numpy from the raw parquet, so a formula
that is wrong the same way in BOTH engines (Spark builder and DuckDB
oracle share an author) still fails here.

Exactness policy: integer fixed-point pipelines (HITS, Bellman-Ford,
streaks, Poisson draws) must match BIT-EXACTLY; pipelines whose terms
are born from libm LN/log10 (naive Bayes, PMI, Benford expectation)
allow a few 1e-9 units of ulp wobble at ROUND boundaries; pure
IEEE-exact float pipelines (EWMA halving weights, drawdown) must match
exactly after their fixed-point cast."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

from copperhead_spark.plans.registry import all_queries

Q = all_queries()


def _df(sf_dir, tbl):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
    ).df()


def _run(spark, sf_dir, name):
    return Q[name].builder(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# graph: HITS + Bellman-Ford (exact integer replays)
# ---------------------------------------------------------------------------


def _edges(sf_dir):
    con = duckdb.connect()
    e = con.execute(
        f"""
        SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/lineitem.parquet') l
          ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    con.close()
    return e


def test_hits_mirror_exact(spark, sf_dir):
    e = _edges(sf_dir)
    hubs = {s: 1_000_000 for s, _ in e}
    auth = {}
    for _ in range(2):
        raw = defaultdict(int)
        for s, d in e:
            raw[d] += hubs[s]
        tot = sum(raw.values())
        auth = {n: (v * 1_000_000) // tot for n, v in raw.items()}
        raw = defaultdict(int)
        for s, d in e:
            if d in auth:
                raw[s] += auth[d]
        tot = sum(raw.values())
        hubs = {n: (v * 1_000_000) // tot for n, v in raw.items()}
    got = _run(spark, sf_dir, "graph_hits")
    want = {("hub", n): v for n, v in hubs.items()}
    want.update({("auth", n): v for n, v in auth.items()})
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.side, r.node)] == r.score_e6, (r.side, r.node)


def test_bellman_ford_mirror_exact(spark, sf_dir):
    e0 = _edges(sf_dir)
    edges = e0 + [(d, s) for s, d in e0]
    dist = {s: 0 for s, _ in e0 if s % 100 == 0}
    for _ in range(4):
        nxt = dict(dist)
        for s, d in edges:
            if s in dist:
                w = 1 + (s + d) % 5
                cand = dist[s] + w
                if d not in nxt or cand < nxt[d]:
                    nxt[d] = min(nxt.get(d, cand), cand)
        dist = nxt
    got = _run(spark, sf_dir, "graph_bellman_ford")
    assert dict(zip(got.node, got.dist)) == dist


# ---------------------------------------------------------------------------
# naive Bayes (libm-tolerant) — predictions must agree, scores to ~ulp
# ---------------------------------------------------------------------------


def test_naive_bayes_mirror(spark, sf_dir):
    docs = _df(sf_dir, "documents")
    rnd = lambda x: round(x * 1e9)  # noqa: E731 - same fixed point as the engines
    train = docs[docs.doc_id % 4 != 0]
    test = docs[docs.doc_id % 4 == 0]
    toks = lambda t: [w for w in t.split(" ") if w]  # noqa: E731
    cnt: Counter = Counter()
    tot: Counter = Counter()
    vocab = set()
    for r in train.itertuples():
        for w in toks(r.text):
            cnt[(r.lang, w)] += 1
            tot[r.lang] += 1
            vocab.add(w)
    v, n = len(vocab), len(train)
    langs = sorted(train.lang.unique())
    ndocs = train.groupby("lang").size().to_dict()
    prior = {c: rnd(math.log(ndocs[c] / n)) for c in langs}
    default = {c: rnd(math.log(1.0 / (tot[c] + v))) for c in langs}
    preds = {}
    for r in test.itertuples():
        tf = Counter(toks(r.text))
        dl = sum(tf.values())
        best = None
        for c in langs:
            s = prior[c] + default[c] * dl
            for w, f in tf.items():
                if (c, w) in cnt:
                    s += f * (rnd(math.log((cnt[(c, w)] + 1) / (tot[c] + v))) - default[c])
            # higher score wins; on ties the smaller lang (matches ORDER BY
            # score_e9 DESC, lang ASC)
            if best is None or s > best[0] or (s == best[0] and c < best[1]):
                best = (s, c)
        preds[r.doc_id] = best
    got = _run(spark, sf_dir, "ml_naive_bayes_classify")
    assert len(got) == len(preds)
    for r in got.itertuples():
        s, c = preds[r.doc_id]
        assert r.pred_lang == c, r.doc_id
        assert abs(r.score_e9 - s) <= 1000, (r.doc_id, r.score_e9, s)


# ---------------------------------------------------------------------------
# EWMA + drawdown (IEEE-exact float replays)
# ---------------------------------------------------------------------------


def test_ewma_mirror_exact(spark, sf_dir):
    ev = _df(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    want = {}
    for _, g in ev.groupby("user_id"):
        vals = list(g.value)
        for i, eid in enumerate(g.event_id):
            lag = lambda k: vals[i - k] if i - k >= 0 else 0.0  # noqa: E731
            x = (
                lag(0) / 2 + lag(1) / 4 + lag(2) / 8 + lag(3) / 16
                + lag(4) / 32 + lag(5) / 64 + lag(6) / 128 + lag(7) / 128
            )
            want[eid] = round(x * 1e9)
    got = _run(spark, sf_dir, "t9_ewma_smoothing")
    assert dict(zip(got.event_id, got.ewma_e9)) == want


def test_max_drawdown_mirror_exact(spark, sf_dir):
    ev = _df(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, g in ev.groupby("user_id"):
        v = g.value.to_numpy()
        runmax = np.maximum.accumulate(v)
        want[uid] = (len(v), round(float((runmax - v).max()) * 1e6),
                     round(float(v.max()) * 1e6))
    got = _run(spark, sf_dir, "t10_max_drawdown")
    for r in got.itertuples():
        assert (r.n_events, r.max_drawdown_e6, r.peak_e6) == want[r.user_id]


# ---------------------------------------------------------------------------
# streaks (exact), Benford (libm-tolerant), Poisson draws (exact)
# ---------------------------------------------------------------------------


def test_streaks_mirror_exact(spark, sf_dir):
    import datetime

    ev = _df(sf_dir, "events")
    epoch = datetime.date(1992, 1, 1)
    days = defaultdict(set)
    for r in ev.itertuples():
        days[r.user_id].add((r.ts.date() - epoch).days)
    got = _run(spark, sf_dir, "t8_streaks_islands")
    assert len(got) == len(days)
    for r in got.itertuples():
        ds = sorted(days[r.user_id])
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert r.n_active_days == len(ds)
        assert r.n_islands == len(runs)
        assert r.longest_streak == max(runs)


def test_benford_mirror(spark, sf_dir):
    orders = _df(sf_dir, "orders")
    digits = Counter()
    for x in orders.o_totalprice:
        i = int(math.floor(x))
        while i >= 10:
            i //= 10
        digits[i] += 1
    total = sum(digits.values())
    got = _run(spark, sf_dir, "dq_benford_profile")
    assert len(got) == len(digits)
    for r in got.itertuples():
        assert r.n == digits[r.digit]
        assert r.observed_ppb == (r.n * 1_000_000_000) // total
        want_exp = round(math.log10(1 + 1 / r.digit) * 1e9)
        assert abs(r.expected_ppb - want_exp) <= 1


def test_poisson_bootstrap_mirror_exact(spark, sf_dir):
    from copperhead_spark.operators.rochester import HASH_P
    from copperhead_spark.plans.training import _POIS_CUM, _POIS_SALT

    orders = _df(sf_dir, "orders")
    thresholds = [float(t) for t in _POIS_CUM]

    def draw(key: int) -> int:
        h = ((key % HASH_P) * 1013904223 + (_POIS_SALT % HASH_P) * 1664525) % HASH_P
        u = h / float(HASH_P)
        for k, t in enumerate(thresholds):
            if u < t:
                return k
        return len(thresholds)

    want = defaultdict(lambda: [0, 0, 0, 0])
    for r in orders.itertuples():
        c = draw(r.o_orderkey)
        cents = round(r.o_totalprice * 100)
        w = want[r.o_orderpriority]
        w[0] += 1
        w[1] += c
        w[2] += cents
        w[3] += c * cents
    got = _run(spark, sf_dir, "sample_poisson_bootstrap")
    for r in got.itertuples():
        assert [r.n_orig, r.n_boot, r.orig_sum_c, r.boot_sum_c] == want[r.o_orderpriority]


# ---------------------------------------------------------------------------
# PMI (counts exact, log tolerant) and incremental-MV idempotence
# ---------------------------------------------------------------------------


def test_pmi_mirror(spark, sf_dir):
    docs = _df(sf_dir, "documents")
    doc_terms = {r.doc_id: set(w for w in r.text.split(" ") if w) for r in docs.itertuples()}
    df = Counter()
    for ts in doc_terms.values():
        df.update(ts)
    v50 = set(
        t for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    )
    pair = Counter()
    for ts in doc_terms.values():
        kept = sorted(ts & v50)
        for i, u in enumerate(kept):
            for w in kept[i + 1:]:
                pair[(u, w)] += 1
    n = len(docs)
    scored = {
        (u, w): (c, round(math.log(n * c / (df[u] * df[w])) * 1e9))
        for (u, w), c in pair.items()
    }
    got = _run(spark, sf_dir, "text_pmi_collocations")
    assert len(got) == 20
    for r in got.itertuples():
        c, pmi = scored[(r.u, r.v)]
        assert r.c_uv == c
        assert abs(r.pmi_e9 - pmi) <= 1


def test_compaction_rerun_stable(spark, sf_dir):
    a = _run(spark, sf_dir, "s19_small_file_compaction")
    b = _run(spark, sf_dir, "s19_small_file_compaction")
    assert a.equals(b)
    assert int(a.n_files_small.iloc[0]) == 48
    assert int(a.n_files_compacted.iloc[0]) == 4


def test_incremental_refresh_equals_rebuild(spark, sf_dir):
    got = _run(spark, sf_dir, "m1_incremental_agg_refresh").sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)
    li = _df(sf_dir, "lineitem")
    li["q"] = (li.l_quantity * 100).round().astype("int64")
    li["p"] = (li.l_extendedprice * 100).round().astype("int64")
    want = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .agg(n=("q", "size"), sum_qty_c=("q", "sum"), sum_price_c=("p", "sum"))
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert (got.n == want.n).all()
    assert (got.sum_qty_c == want.sum_qty_c).all()
    assert (got.sum_price_c == want.sum_price_c).all()


# ---------------------------------------------------------------------------
# batch-5 mirrors: MaxSim, link prediction, decision stump (exact integers)
# ---------------------------------------------------------------------------


def _tok_hashes(text: str):
    from copperhead_spark.functions.text import TOKEN_P

    out = []
    for w in text.split(" "):
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) % TOKEN_P
        out.append(h)
    return out


def test_maxsim_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.retrieval import (
        _EMB_AB, _EMB_M, _EMB_Q, _MS_QUERIES, _MS_TOPK,
    )

    def emb(h):
        return [((h * a + b) % _EMB_M) % _EMB_Q for a, b in _EMB_AB]

    docs = _df(sf_dir, "documents")
    doc_tok = {r.doc_id: {tuple(emb(h)) for h in set(_tok_hashes(r.text))}
               for r in docs.itertuples()}
    scores = []
    for qid, qtext in _MS_QUERIES:
        for did, dembs in doc_tok.items():
            s = 0
            for hq in set(_tok_hashes(qtext)):
                eq = emb(hq)
                s += max(sum(a * b for a, b in zip(eq, ed)) for ed in dembs)
            scores.append((qid, did, s))
    want = {}
    for qid, _ in _MS_QUERIES:
        qs = sorted((r for r in scores if r[0] == qid), key=lambda r: (-r[2], r[1]))
        for rank, (q, d, s) in enumerate(qs[:_MS_TOPK], 1):
            want[(q, d)] = (s, rank)
    got = _run(spark, sf_dir, "emb_maxsim_topk")
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.qid, r.doc_id)] == (r.maxsim, r.rank)


def test_link_prediction_mirror_exact(spark, sf_dir):
    from copperhead_spark.plans.graph import _LP_DEGCAP, _LP_MOD, _LP_TOPK

    li = _df(sf_dir, "lineitem")
    li = li[li.l_orderkey % _LP_MOD == 0]
    orders = defaultdict(set)
    for r in li.itertuples():
        orders[r.l_orderkey].add(r.l_partkey)
    e0 = set()
    for ps in orders.values():
        s = sorted(ps)
        for i, u in enumerate(s):
            for v in s[i + 1:]:
                e0.add((u, v))
    deg0 = Counter()
    for u, v in e0:
        deg0[u] += 1
        deg0[v] += 1
    keep = {x for x, d in deg0.items() if d <= _LP_DEGCAP}
    sub = {(u, v) for u, v in e0 if u in keep and v in keep}
    nbrs = defaultdict(set)
    for u, v in sub:
        nbrs[u].add(v)
        nbrs[v].add(u)
    cand = []
    seen = set()
    for w, ns in nbrs.items():
        s = sorted(ns)
        for i, u in enumerate(s):
            for v in s[i + 1:]:
                if (u, v) in sub or (u, v) in seen:
                    continue
                seen.add((u, v))
                cn = len(nbrs[u] & nbrs[v])
                j = (cn * 1_000_000) // (len(nbrs[u]) + len(nbrs[v]) - cn)
                cand.append((u, v, cn, j))
    cand.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = cand[:_LP_TOPK]
    got = _run(spark, sf_dir, "graph_link_prediction")
    got_rows = sorted(
        zip(got.u, got.v, got.cn, got.jaccard_e6), key=lambda r: (-r[3], r[0], r[1])
    )
    assert [tuple(map(int, r)) for r in got_rows] == want


def test_decision_stump_mirror_exact(spark, sf_dir):
    li = _df(sf_dir, "lineitem")
    cnt = Counter(zip(li.l_quantity.astype("int64"), li.l_returnflag))
    classes = sorted(li.l_returnflag.unique())
    tot = Counter()
    for (q, c), n in cnt.items():
        tot[c] += n

    def sdiv(a, b):
        return (a // b) * 10000 + ((a % b) * 10000) // b

    want = {}
    for t in range(1, 51):
        cums = {c: sum(n for (q, cc), n in cnt.items() if cc == c and q <= t)
                for c in classes}
        n_l = sum(cums.values())
        n_r = sum(tot.values()) - n_l
        if n_l == 0 or n_r == 0:
            continue
        sq_l = sum(v * v for v in cums.values())
        sq_r = sum((tot[c] - cums[c]) ** 2 for c in classes)
        want[t] = (n_l, n_r, sdiv(sq_l, n_l) + sdiv(sq_r, n_r))
    ranks = sorted(want.items(), key=lambda kv: (-kv[1][2], kv[0]))
    rank_of = {t: i + 1 for i, (t, _) in enumerate(ranks)}
    got = _run(spark, sf_dir, "ml_decision_stump")
    assert len(got) == len(want)
    for r in got.itertuples():
        n_l, n_r, p = want[r.threshold]
        assert (r.n_l, r.n_r, r.purity_e4, r.rank) == (n_l, n_r, p, rank_of[r.threshold])
