"""Semantic unit tests for the sessionization, PageRank, and
record-linkage operator families (plans/sessions.py, plans/graph.py,
plans/linkage.py).  Oracle parity is covered by test_oracle_parity; these
pin the *semantics* on hand-checkable properties."""

import pytest

from copperhead_spark.plans.registry import all_queries

QS = all_queries()


@pytest.fixture(scope="module")
def sessions(spark, sf_dir):
    return QS["sessionize_events"].builder(spark, sf_dir).toPandas()


def test_session_ids_are_dense_from_one(sessions):
    for _, g in sessions.groupby("user_id"):
        ids = sorted(g["session_id"])
        assert ids == list(range(1, len(ids) + 1))


def test_sessions_do_not_overlap_and_gap_exceeds_threshold(sessions):
    gap_us = 12 * 3600 * 1_000_000
    for _, g in sessions.groupby("user_id"):
        g = g.sort_values("session_id")
        assert (g["end_us"] >= g["start_us"]).all()
        # consecutive sessions are separated by more than the gap
        nxt = g["start_us"].shift(-1).dropna()
        assert ((nxt.values - g["end_us"].values[:-1]) > gap_us).all()


def test_session_event_count_conserved(spark, sf_dir, sessions):
    from copperhead_spark.catalog import table

    assert int(sessions["n_events"].sum()) == table(spark, sf_dir, "events").count()


def test_funnel_counts_monotone(spark, sf_dir):
    row = QS["session_funnel"].builder(spark, sf_dir).first()
    assert row["n_view"] >= row["n_view_click"] >= row["n_view_click_purchase"] >= 0


def test_pagerank_covers_all_nodes_with_positive_rank(spark, sf_dir):
    pr = QS["graph_pagerank"].builder(spark, sf_dir).toPandas()
    assert pr["node"].is_unique
    # teleport term is a hard floor; symmetrized graph leaves no node out
    assert (pr["rank_e6"] >= 150_000).all()
    # both node families (customers, suppliers at +1e6) are present
    assert (pr["node"] < 1_000_000).any() and (pr["node"] >= 1_000_000).any()


def test_tfidf_blocked_pairs_stay_within_blocks(spark, sf_dir):
    from copperhead_spark.catalog import table

    pairs = QS["text_tfidf_blocked_pairs"].builder(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    ).toPandas().set_index("doc_id")
    assert (pairs["doc_a"] < pairs["doc_b"]).all()
    for _, r in pairs.head(50).iterrows():
        assert docs.loc[r["doc_a"], "lang"] == r["lang"]
        assert docs.loc[r["doc_b"], "source"] == r["source"]
    # the integer cosine threshold actually held
    assert (
        2.0 * pairs["dot_ww"].astype(float) ** 2
        >= pairs["norm_a"].astype(float) * pairs["norm_b"].astype(float)
    ).all()


def test_bpe_pairs_are_two_chars_and_rank_consistent(spark, sf_dir):
    bp = QS["text_bpe_pair_counts"].builder(spark, sf_dir).toPandas()
    assert (bp["pair"].str.len() == 2).all()
    assert list(bp["rank"]) == list(range(1, len(bp) + 1))
    assert (bp["n"].diff().dropna() <= 0).all()  # sorted by count desc


def test_incremental_dedup_classifies_every_batch_doc(spark, sf_dir):
    from copperhead_spark.catalog import table

    out = QS["dedup_incremental_index"].builder(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").toPandas()
    batch_ids = set(docs.loc[docs["doc_id"] % 5 == 4, "doc_id"])
    assert set(out["doc_id"]) == batch_ids
    assert set(out["dup_kind"]) <= {"exact", "near", "unique"}
    # exact implies identical lowercase text exists in the index
    idx_texts = set(docs.loc[docs["doc_id"] % 5 != 4, "text"].str.lower())
    by_id = docs.set_index("doc_id")["text"]
    for d in out.loc[out["dup_kind"] == "exact", "doc_id"]:
        assert by_id[d].lower() in idx_texts
    # and any batch doc whose text IS in the index must be caught as exact
    for d in batch_ids:
        if by_id[d].lower() in idx_texts:
            kind = out.loc[out["doc_id"] == d, "dup_kind"].iloc[0]
            assert kind == "exact"


def test_triangle_count_consistent_with_degree_histogram(spark, sf_dir):
    tri = QS["graph_triangle_count"].builder(spark, sf_dir).first()
    hist = QS["graph_degree_histogram"].builder(spark, sf_dir).toPandas()
    assert tri["n_triangles"] >= 0
    # handshake: sum(degree * nodes) == 2 * edges, node totals agree
    assert int((hist["degree"] * hist["n_nodes"]).sum()) == 2 * tri["n_edges"]
    assert int(hist["n_nodes"].sum()) == tri["n_nodes"]


def test_spike_detection_flags_injected_burst(spark):
    import pandas as pd

    # 72 quiet hours (n=10) then one 100-event burst hour
    rows = []
    eid = 0
    for h in range(73):
        n = 100 if h == 72 else 10
        for i in range(n):
            rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h, seconds=i), 1))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["event_type"] = "view"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    import tempfile, os
    d = tempfile.mkdtemp(prefix="spike_fixture_")
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    try:
        out = QS["events_spike_detection"].builder(spark, d).toPandas()
        out = out.sort_values("hour_us").reset_index(drop=True)
        assert out["is_spike"].sum() == 1
        assert out.loc[out["is_spike"] == 1, "n"].iloc[0] == 100
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


def test_kcore_is_converged_and_every_member_has_k_neighbors(spark, sf_dir):
    """One extra peeling round changes nothing (the fixed _KCORE_ITERS is
    past the fixpoint), and every member's within-core degree >= k."""
    from copperhead_spark.plans.graph import (
        _KCORE_ITERS,
        _KCORE_K,
        _support_edges,
        kcore_members,
    )
    from pyspark.sql import functions as F

    e0 = _support_edges(spark, sf_dir)
    sym = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .selectExpr("u AS src", "v AS dst")
        .localCheckpoint()
    )
    core = kcore_members(sym, _KCORE_K, _KCORE_ITERS).toPandas()
    again = kcore_members(sym, _KCORE_K, _KCORE_ITERS + 5).toPandas()
    assert sorted(core["node"]) == sorted(again["node"])
    if len(core):
        assert int(core["core_degree"].min()) >= _KCORE_K
