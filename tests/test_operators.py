"""Operator unit tests against independent numpy/pandas oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_asof_join_matches_merge_asof(spark):
    from copperhead_spark.operators.asof import asof_join_backward

    rng = np.random.RandomState(0)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "t": rng.randint(0, 1000, 200).astype("datetime64[s]"),
            "lid": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 100),
            "t": rng.randint(0, 1000, 100).astype("datetime64[s]"),
            "val": rng.uniform(size=100).round(4),
        }
    )
    # pandas oracle (backward, inclusive)
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t").rename(columns={"t": "rt"}),
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
    ).sort_values("lid")

    ldf = spark.createDataFrame(left.rename(columns={"t": "ts"}))
    rdf = spark.createDataFrame(right.rename(columns={"t": "ts"}))
    got = (
        asof_join_backward(ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", payload=["val"])
        .toPandas()
        .sort_values("lid")
    )
    # matched timestamps agree (payload can differ when several right rows
    # share the match timestamp; merge_asof picks the last-in-order, we
    # pick max(payload) -- timestamps are the defined contract)
    a = got["matched_ts"].to_numpy("datetime64[s]")
    b = expected["rt"].to_numpy("datetime64[s]")
    both_nat = pd.isna(got["matched_ts"]).to_numpy() & pd.isna(expected["rt"]).to_numpy()
    assert (both_nat | (a == b)).all()


def test_interp1d_matches_np_interp(spark):
    from copperhead_spark.operators.lookup import interp1d_expr

    xs = [0.0, 1.0, 3.0, 7.0, 10.0]
    ys = [1.0, 2.0, 0.5, 4.0, 3.0]
    pts = np.linspace(-2, 12, 101)
    df = spark.createDataFrame(pd.DataFrame({"x": pts}))
    got = (
        df.withColumn("y", interp1d_expr(F.col("x"), xs, ys))
        .toPandas()
        .sort_values("x")["y"]
        .to_numpy()
    )
    expected = np.interp(np.sort(pts), xs, ys)
    assert np.allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_product_agg_zeros_negatives(spark):
    from copperhead_spark.operators.aggregates import product_agg, sign_product

    pdf = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 3, 3, 3, 4],
            "x": [2.0, -3.0, 0.5, 0.0, 5.0, -1.0, -2.0, -4.0, 7.0],
            "q": [1, -1, 1, -1, -1, -1, -1, -1, 1],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.groupBy("g")
        .agg(product_agg(F.col("x")).alias("p"), sign_product(F.col("q")).alias("s"))
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    expected_p = pdf.groupby("g")["x"].apply(lambda s: float(np.prod(np.sort(s.to_numpy()))))
    for g in (1, 2, 3, 4):
        assert got.loc[g, "p"] == pytest.approx(expected_p[g], rel=1e-14)
    expected_s = pdf.groupby("g")["q"].apply(lambda s: 1 if (s < 0).sum() % 2 == 0 else -1)
    assert got["s"].tolist() == expected_s.sort_index().tolist()


def test_histogram_matches_numpy(spark):
    from copperhead_spark.operators.histogram import histogram

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({"x": rng.uniform(-10, 120, 5000), "w": rng.uniform(0, 2, 5000).round(4)})
    df = spark.createDataFrame(pdf)
    got = (
        histogram(df, F.col("x"), lo=0.0, hi=100.0, nbins=20, weight=F.col("w"), scale=6)
        .toPandas()
        .set_index("bin_idx")
        .sort_index()
    )
    inside = pdf[(pdf.x >= 0) & (pdf.x < 100)]
    counts, _ = np.histogram(
        inside.x, bins=20, range=(0, 100), weights=np.round(inside.w * 1e6).astype(np.int64)
    )
    for b in range(20):
        assert got.loc[b, "value"] == pytest.approx(counts[b] / 1e6, abs=1e-9)
    # clamped under/overflow bins present
    assert -1 in got.index and 20 in got.index
    assert got.loc[-1, "value"] == pytest.approx(
        np.round(pdf[pdf.x < 0].w * 1e6).astype(np.int64).sum() / 1e6, abs=1e-9
    )


def test_ml_udf_matches_numpy(spark):
    from copperhead_spark.ml.inference import FEATURES, _forward, attach_scores, fold_weights

    pdf = pd.DataFrame(
        {
            "l_orderkey": np.arange(500),
            "l_quantity": np.random.RandomState(1).uniform(1, 50, 500).round(2),
            "l_discount": np.random.RandomState(2).uniform(0, 0.1, 500).round(4),
            "l_tax": np.random.RandomState(3).uniform(0, 0.08, 500).round(4),
            "l_extendedprice": np.random.RandomState(4).uniform(900, 100000, 500).round(2),
        }
    )
    df = spark.createDataFrame(pdf)
    got = attach_scores(df).toPandas().sort_values("l_orderkey")["score"].to_numpy()
    X = np.column_stack(
        [
            pdf.l_quantity / 50.0,
            pdf.l_discount * 10,
            pdf.l_tax * 10,
            pdf.l_extendedprice / 100000.0,
        ]
    )
    folds = pdf.l_orderkey.to_numpy() % 2
    expected = np.empty(500)
    for k in (0, 1):
        m = folds == k
        expected[m] = _forward(fold_weights(k), X[m])
    assert np.allclose(got, expected, rtol=1e-12)


def test_multimodal_decode(spark):
    from copperhead_spark.operators.multimodal import decode_media, fake_decode

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"hello world" * 10, b"abc" * 40]})
    df = spark.createDataFrame(pdf)
    got = decode_media(df).toPandas().set_index("doc_id").sort_index()
    for i, payload in ((1, b"hello world" * 10), (2, b"abc" * 40)):
        exp = fake_decode(payload)
        for k, v in exp.items():
            assert got.loc[i, k] == v, (i, k)


def test_weights_ledger_variations(spark):
    from copperhead_spark.operators.weights import WeightsLedger

    pdf = pd.DataFrame({"w1": [0.5, 2.0, 0.0], "w2": [1.1, 0.9, 1.0]})
    df = spark.createDataFrame(pdf)
    ledger = (
        WeightsLedger()
        .add_weight_with_variations("a", F.col("w1"), F.col("w1") * 2, F.col("w1") / 2)
        .add_weight("b", F.col("w2"))
    )
    out = ledger.with_columns(df).toPandas()
    assert np.allclose(out["wgt_nominal"], pdf.w1 * pdf.w2)
    # up-variation replaces the factor (no division -> zero-safe)
    assert np.allclose(out["wgt_a_up"], pdf.w1 * 2 * pdf.w2)
    assert np.allclose(out["wgt_a_down"], pdf.w1 / 2 * pdf.w2)
    # an only_vars variation whose NAME collides with '{factor}_suffix'
    # must multiply the full nominal, not replace factor 'a' (dispatch is
    # by registration, not name parsing)
    ledger2 = (
        WeightsLedger()
        .add_weight("a", F.col("w1"))
        .add_weight("b", F.col("w2"))
        .add_variation_only("a_up", F.lit(3.0))
    )
    out2 = ledger2.with_columns(df).toPandas()
    assert np.allclose(out2["wgt_a_up"], pdf.w1 * pdf.w2 * 3.0)


def test_connected_components_matches_union_find(spark):
    from copperhead_spark.operators.graph import connected_components

    rng = np.random.RandomState(7)
    n = 300
    # random sparse graph + a 40-node chain (diameter stress: hash-min
    # must iterate, not converge in one round)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, (150, 2)) if a != b]
    edges += [(260 + i, 261 + i) for i in range(39)]

    # independent oracle: union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in range(n)}
    # path-compress fully: representative must be the min node id
    expected = {x: min(y for y in range(n) if find(y) == find(x)) for x in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(nodes, edf).collect()
    }
    assert got == expected


def test_quality_signals_semantics(spark):
    """Hand-crafted docs with known signal values: guards against
    inverted/degenerate expressions that a shared-constant oracle can't
    catch (both engines would agree on the same wrong formula)."""
    from copperhead_spark.plans.text import (
        _DUPTRI_SPARK,
        _SYMRATIO_SPARK,
        _gopher_pass,
    )

    docs = spark.createDataFrame(
        [
            # 10 chars, 2 symbols (# and !) -> symratio 0.2
            (0, "ab#cd ef!g"),
            # trigrams: "a b c","b c a","c a b","a b c","b c a" -> 5 slots,
            # 3 distinct -> dup fraction 2/5
            (1, "a b c a b c a"),
            # clean doc passing every gopher rule (20 tokens, mtl in
            # window, no symbols, no repeated trigram)
            (2, " ".join(f"tok{i:02d}" for i in range(20))),
            # symbol-heavy doc failing the symratio cap
            (3, " ".join("@@@@" for _ in range(20))),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in docs.selectExpr(
            "doc_id",
            f"{_SYMRATIO_SPARK} AS sym",
            f"{_DUPTRI_SPARK} AS dup",
            f"{_gopher_pass('spark')} AS pass",
        ).collect()
    }
    assert abs(got[0]["sym"] - 0.2) < 1e-12
    assert abs(got[1]["dup"] - 0.4) < 1e-12
    assert got[2]["sym"] == 0.0 and got[2]["dup"] == 0.0 and got[2]["pass"]
    assert not got[3]["pass"]


def test_pii_redaction_semantics(spark):
    """Crafted strings pin the redaction behavior (the synthetic corpus
    contains no PII, so the parity check alone is vacuous there)."""
    from copperhead_spark.plans.text import _EMAIL_RE, _URL_RE

    docs = spark.createDataFrame(
        [
            (0, "contact bob.smith+x@example.co.uk or see https://a.b/c?d=1 now"),
            (1, "no pii here at all"),
            (2, "two mails x@y.io z@w.ai and http://plain.url"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in docs.selectExpr(
            "doc_id",
            f"size(regexp_extract_all(text, '{_EMAIL_RE}', 0)) AS n_emails",
            f"size(regexp_extract_all(text, '{_URL_RE}', 0)) AS n_urls",
            f"regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>'),"
            f" '{_URL_RE}', '<URL>') AS redacted",
        ).collect()
    }
    assert got[0]["n_emails"] == 1 and got[0]["n_urls"] == 1
    assert got[0]["redacted"] == "contact <EMAIL> or see <URL> now"
    assert got[1]["n_emails"] == 0 and got[1]["n_urls"] == 0
    assert got[2]["n_emails"] == 2 and got[2]["n_urls"] == 1


def test_kmeans_lloyd_matches_numpy(spark, sf_dir):
    """Distributed Lloyd vs an independent numpy mirror: same micro-int
    quantization, same min-distance/lowest-cid assignment, same exact
    integer round-half-away(sum/n) update — centroids must be
    integer-identical after 3 iterations (no float arithmetic anywhere
    on either path)."""
    import numpy as np

    from copperhead_spark.catalog import table
    from copperhead_spark.operators.kmeans import deterministic_centroids, kmeans_lloyd

    emb = table(spark, sf_dir, "embeddings")
    got = kmeans_lloyd(emb, k=8, iters=3, dim=64)

    x = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    e6 = np.round(x * 1_000_000).astype(np.int64)
    cents = np.array(deterministic_centroids(8, 64), dtype=np.int64)
    for _ in range(3):
        d2 = ((e6[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes first (lowest cid) on ties
        for cid in range(8):
            members = e6[assign == cid]
            if len(members):
                n = len(members)
                cents[cid] = np.array(
                    [
                        (2 * int(s) + n) // (2 * n)
                        if s >= 0
                        else -((-2 * int(s) + n) // (2 * n))
                        for s in members.sum(axis=0)
                    ],
                    dtype=np.int64,
                )
    assert got == cents.tolist()


def test_ivf_recall_floor(spark, sf_dir):
    """The ANN quality gate: IVF top-k at nprobe=4 must recover >= 60%
    of the exact brute-force neighbors on average (per-query recall is
    also bounded away from zero)."""
    from copperhead_spark.plans.registry import all_queries

    rows = all_queries()["sim_ivf_recall"].builder(spark, sf_dir).collect()
    assert len(rows) == 5
    recalls = [r["recall"] for r in rows]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    assert min(recalls) >= 0.2, recalls
    for r in rows:
        assert r["k"] == 5 and 0 <= r["n_match"] <= 5


def test_pq_recall_floor(spark):
    """PQ quality gate: the ADC-shortlist + exact-re-rank pipeline must
    recover >= 80% of the exact top-5 on average at shortlist depth 50
    (sf0.01: 495 candidates, so the shortlist is a real 10% cut)."""
    from copperhead_spark.plans.registry import all_queries

    rows = (
        all_queries()["sim_pq_recall"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert len(rows) == 5
    recalls = [r["recall"] for r in rows]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert min(recalls) >= 0.4, recalls
