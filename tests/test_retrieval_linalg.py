"""Semantic unit tests for the retrieval / linalg / mixture / dedup-
representative operators (the oracle gate checks cross-engine parity;
these check the MATH against independent numpy / python mirrors)."""

import math

import numpy as np
import pytest


def _embeddings(spark, sf_dir):
    from copperhead_spark.catalog import table

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_matrix_matches_numpy(spark, sf_dir):
    from copperhead_spark.catalog import table
    from copperhead_spark.operators.linalg import E6_SCALE, gram_matrix

    from copperhead_spark.functions.vectors import _round_half_away

    X = _embeddings(spark, sf_dir)
    # SQL ROUND semantics (half away from zero), same as the oracle
    Xi = _round_half_away(X * E6_SCALE).astype(np.int64)
    want = (Xi.T @ Xi).astype(np.float64) / float(E6_SCALE) ** 2

    got = gram_matrix(table(spark, sf_dir, "embeddings"), dim=64).collect()
    assert len(got) == 64 * 65 // 2
    for r in got:
        assert r["sum_xy"] == pytest.approx(want[r["i"] - 1, r["j"] - 1], abs=0.0)


def test_gram_matrix_partition_invariant(spark, sf_dir):
    """Partial-aggregation correctness: the result must not depend on how
    rows are batched across partitions."""
    from copperhead_spark.catalog import table
    from copperhead_spark.operators.linalg import gram_matrix

    emb = table(spark, sf_dir, "embeddings")
    a = {(r["i"], r["j"]): r["sum_xy"] for r in gram_matrix(emb, dim=64).collect()}
    b = {
        (r["i"], r["j"]): r["sum_xy"]
        for r in gram_matrix(emb.repartition(7), dim=64).collect()
    }
    assert a == b


def test_random_projection_matches_numpy(spark, sf_dir):
    from copperhead_spark.operators.linalg import jl_signs
    from copperhead_spark.plans.registry import all_queries

    from copperhead_spark.functions.vectors import _round_half_away

    X = _embeddings(spark, sf_dir)
    Xi = _round_half_away(X * 1e6).astype(np.int64)
    S = np.array(jl_signs(64, 8), dtype=np.int64)  # (8, 64)
    want = (Xi @ S.T).astype(np.float64) / 1e6 / math.sqrt(8.0)

    q = all_queries()["emb_random_projection"]
    got = q.builder(spark, sf_dir).orderBy("vec_id").collect()
    for k, r in enumerate(got):
        for j in range(8):
            assert r[f"p{j}"] == pytest.approx(want[k, j], abs=0.0)


def test_jl_signs_deterministic_and_balanced():
    from copperhead_spark.operators.linalg import jl_signs

    s1, s2 = jl_signs(64, 8), jl_signs(64, 8)
    assert s1 == s2
    flat = [v for row in s1 for v in row]
    assert set(flat) == {-1, 1}
    # a sign matrix that is all +1 (or heavily imbalanced) is no
    # projection at all; the hash family must mix
    frac = sum(1 for v in flat if v == 1) / len(flat)
    assert 0.3 < frac < 0.7


def test_bm25_semantics(spark, sf_dir):
    from copperhead_spark.plans.registry import all_queries
    from copperhead_spark.plans.retrieval import _TERMS, _TOPN

    q = all_queries()["text_bm25_topk"]
    rows = q.builder(spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOPN
    # ranks are 1..n and scores non-increasing along them
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["bm25"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))

    # the top doc must actually contain at least one query term
    from copperhead_spark.catalog import table

    top_doc = (
        table(spark, sf_dir, "documents")
        .filter(f"doc_id = {rows[0]['doc_id']}")
        .collect()[0]["text"]
    )
    assert any(t in top_doc.split(" ") for t in _TERMS)


def test_domain_mixture_rates(spark, sf_dir):
    from copperhead_spark.catalog import table
    from copperhead_spark.plans.registry import all_queries

    docs = table(spark, sf_dir, "documents")
    mass = {
        r["source"]: r["m"]
        for r in docs.groupBy("source").agg({"n_chars": "sum"}).withColumnRenamed(
            "sum(n_chars)", "m"
        ).collect()
    }
    max_mass = max(mass.values())

    q = all_queries()["sample_domain_mixture"]
    kept = q.builder(spark, sf_dir).collect()
    # per-source rate is sqrt(mass/max): verify the emitted rate column
    for r in kept:
        want = math.sqrt(float(mass[r["source"]])) / math.sqrt(float(max_mass))
        assert r["rate"] == pytest.approx(want, rel=1e-12)
    # the heaviest source has rate 1.0 => every one of its docs is kept
    heaviest = max(mass, key=lambda s: (mass[s], s))
    n_heaviest = docs.filter(docs.source == heaviest).count()
    assert sum(1 for r in kept if r["source"] == heaviest) == n_heaviest
    # lighter sources are downsampled (strictly fewer than total docs)
    assert len(kept) < docs.count()


def test_cluster_representatives_semantics(spark, sf_dir):
    from copperhead_spark.plans.registry import all_queries

    qs = all_queries()
    cc = {
        r["doc_id"]: r["component"]
        for r in qs["dedup_connected_components"].builder(spark, sf_dir).collect()
    }
    reps = qs["dedup_cluster_representatives"].builder(spark, sf_dir).collect()
    # exactly one representative per component
    comps = [r["component"] for r in reps]
    assert len(comps) == len(set(comps)) == len(set(cc.values()))
    # every representative belongs to the component it represents
    for r in reps:
        assert cc[r["kept_doc_id"]] == r["component"]
    # sizes add back up to the corpus
    assert sum(r["cluster_size"] for r in reps) == len(cc)


def test_hll_estimate_accuracy(spark, sf_dir):
    """The sketch must land near the exact distinct count (p=12 =>
    ~1.6% std error; linear-counting regime here is tighter)."""
    from copperhead_spark.catalog import table
    from copperhead_spark.plans.registry import all_queries

    li = table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.selectExpr("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    est = {
        r["grp"]: r["n_distinct_est"]
        for r in all_queries()["sketch_hll_distinct"].builder(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.10, (g, est[g], exact[g])


def test_hll_sketch_merges(spark, sf_dir):
    """Mergeability: sketching two halves and MAX-merging the cells must
    give the identical estimate to sketching the whole — the property
    that makes the sketch incrementally maintainable at scale."""
    from pyspark.sql import functions as F

    from copperhead_spark.catalog import table
    from copperhead_spark.plans.sketches import (
        _bucket_sql,
        _estimate_sql,
        _rank_sql,
    )

    li = table(spark, sf_dir, "lineitem")

    def cells(df):
        return (
            df.selectExpr(
                "l_returnflag AS grp",
                f"{_bucket_sql('l_orderkey')} AS bucket",
                f"{_rank_sql('l_orderkey')} AS rank",
            )
            .groupBy("grp", "bucket")
            .agg(F.max("rank").alias("r"))
        )

    def estimate(cells_df):
        sk = cells_df.groupBy("grp").agg(
            F.count("*").cast("long").alias("v_present"),
            F.sum(
                F.expr(
                    "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE)"
                )
            ).alias("z"),
        )
        return {
            r["grp"]: r["e"]
            for r in sk.selectExpr("grp", f"{_estimate_sql()} AS e").collect()
        }

    whole = estimate(cells(li))
    h1, h2 = li.filter("l_orderkey % 2 = 0"), li.filter("l_orderkey % 2 = 1")
    merged_cells = (
        cells(h1).unionAll(cells(h2)).groupBy("grp", "bucket").agg(F.max("r").alias("r"))
    )
    assert estimate(merged_cells) == whole


def test_bloom_no_false_negatives_and_reduces(spark, sf_dir):
    from copperhead_spark.catalog import table
    from copperhead_spark.operators.bloom import bloom_might_contain, build_bloom

    li = table(spark, sf_dir, "lineitem")
    dim = (
        table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'")
        .select("o_orderkey")
    )
    bitmap = build_bloom(dim, "o_orderkey", log2_bits=16)

    true_matches = li.join(
        dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi"
    ).count()
    passed = li.filter(bloom_might_contain(bitmap, "l_orderkey", 16)).count()
    total = li.count()
    # every true match passes (Bloom filters have no false negatives)
    assert passed >= true_matches
    # and the prefilter is an actual reduction: false positives are a
    # small fraction of the non-matching rows
    fp = passed - true_matches
    assert fp <= 0.05 * (total - true_matches), (passed, true_matches, total)


def test_cms_never_undercounts(spark, sf_dir):
    """CMS property: estimate >= true frequency for every queried term,
    and the overcount stays within the collision budget."""
    from copperhead_spark.catalog import table
    from copperhead_spark.plans.registry import all_queries
    from copperhead_spark.plans.sketches import _CMS_TERMS, _CMS_W

    docs = table(spark, sf_dir, "documents")
    toks = docs.selectExpr("explode(split(text, ' ')) AS w")
    n_total = toks.count()
    true = {
        t: toks.filter(toks.w == t).count() for t in _CMS_TERMS
    }
    est = {
        r["term"]: r["est_count"]
        for r in all_queries()["sketch_cms_counts"].builder(spark, sf_dir).collect()
    }
    assert set(est) == set(true)
    for t in _CMS_TERMS:
        assert est[t] >= true[t], (t, est[t], true[t])
        # standard CMS bound: overcount < e * n_tokens / width  (w=1024)
        assert est[t] - true[t] <= 2.72 * n_total / _CMS_W + 1, (t, est[t], true[t])


def test_cms_kernel_bitequal_to_expression_form(spark, sf_dir):
    """The vectorized bincount kernel and the explode/stack SQL form must
    produce the identical cell table."""
    from copperhead_spark.catalog import table
    from copperhead_spark.operators.sketch_kernels import cms_cells
    from copperhead_spark.plans.sketches import _CMS_SALTS, _CMS_W, cms_cells_expr

    docs = table(spark, sf_dir, "documents")
    got = {
        (r["salt"], r["bucket"]): r["c"]
        for r in cms_cells(docs, "text", _CMS_SALTS, _CMS_W).collect()
    }
    want = {
        (r["salt"], r["bucket"]): r["c"]
        for r in cms_cells_expr(spark, sf_dir).collect()
    }
    assert got == want
