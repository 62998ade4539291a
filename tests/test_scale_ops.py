"""Scale-path operators: salting equivalence, bucketed co-located joins,
variable-edge binning."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_salted_sum_equals_plain(spark):
    from copperhead_spark.operators.skew import salted_sum

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            # pathological skew: 80% of rows on one key
            "k": np.where(rng.uniform(size=20000) < 0.8, 0, rng.randint(1, 50, 20000)),
            "v": rng.uniform(0, 100, 20000).round(2),
        }
    )
    df = spark.createDataFrame(pdf)
    scaled = F.round(F.col("v") * 100).cast("long")
    got = (
        salted_sum(df, ["k"], {"v_scaled": scaled}, n_salts=8)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    plain = (
        df.groupBy("k")
        .agg(F.sum(scaled).alias("v_scaled"), F.count("*").alias("n"))
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert got["v_scaled"].equals(plain["v_scaled"])  # bit-exact
    assert got["n"].equals(plain["n"])


def test_bucketed_join_avoids_shuffle(spark):
    """bucketBy co-location: a join between two tables bucketed on the
    join key needs no Exchange on either side (SURVEY.md §2: bucketing
    as the co-located-join strategy for repeated event-key joins)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_bucket_a", "t_bucket_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    pdf = pd.DataFrame({"k": np.arange(1000), "v": np.arange(1000) * 2.0})
    df = spark.createDataFrame(pdf)
    df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_bucket_a")
    df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_bucket_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would win on a toy table
        # and bypass bucketing entirely)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bin_by_edges_matches_digitize(spark):
    from copperhead_spark.operators.histogram import bin_by_edges

    edges = [0.0, 0.5, 1.2, 2.0, 5.0]
    xs = np.array([-1.0, 0.0, 0.49, 0.5, 1.19, 1.99, 2.0, 4.99, 5.0, 7.0])
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (
        df.withColumn("b", bin_by_edges(F.col("x"), edges))
        .toPandas()
        .sort_values("x")["b"]
        .to_numpy()
    )
    expected = np.digitize(np.sort(xs), edges) - 1
    # np.digitize maps >= last edge to len(edges)-1 too; clamp identical
    expected = np.clip(expected, -1, len(edges) - 1)
    assert (got == expected).all(), (got, expected)


def test_salted_join_spreads_and_matches_plain(spark):
    """salted_join must (a) equal the plain join row-for-row, (b) hash-
    partition both sides on (key, salt) — a ShuffledHashJoin, never a
    broadcast (broadcasting would silently drop the skew-spreading)."""
    import numpy as np

    from copperhead_spark.operators.skew import salted_join

    rng = np.random.RandomState(7)
    fact = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": np.arange(30000),
                # one hot key holding 90% of rows
                "k": np.where(rng.uniform(size=30000) < 0.9, 0, rng.randint(1, 5, 30000)),
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"dk": np.arange(5), "label": [f"l{i}" for i in range(5)]})
    )
    joined = salted_join(fact, dim, on=[("k", "dk")], salt_from=F.col("rid"), n_salts=8)
    got = joined.groupBy("label").count().toPandas().set_index("label").sort_index()
    plain = (
        fact.join(dim, fact.k == dim.dk)
        .groupBy("label")
        .count()
        .toPandas()
        .set_index("label")
        .sort_index()
    )
    assert got["count"].equals(plain["count"])

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_binned_quantile_estimates_within_one_bin_width(spark, duck, sf_dir):
    """The sketch's documented error bound: every estimate is within one
    bin width of the exact quantile (upper-edge estimator: exact value
    lies inside the selected bin)."""
    from copperhead_spark.plans.registry import all_queries
    from copperhead_spark.plans.sketches import _BQ_WIDTH

    est = {
        r["q"]: r["est_upper"]
        for r in all_queries()["sketch_binned_quantiles"].builder(spark, sf_dir).collect()
    }
    true = duck.execute(
        "SELECT quantile_cont(l_extendedprice, [0.25,0.5,0.75,0.9,0.99]) FROM lineitem"
    ).fetchone()[0]
    for q, t in zip([0.25, 0.5, 0.75, 0.9, 0.99], true):
        assert 0 <= est[q] - t <= _BQ_WIDTH, (q, est[q], t)


def test_hll_merge_equals_rebuild(spark, sf_dir):
    """Sketch mergeability: folding per-day cells by MAX gives exactly
    the full-rebuild estimate for every group."""
    from copperhead_spark.plans.registry import all_queries

    rows = all_queries()["sketch_hll_merge_days"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_merged"] == r["est_direct"], r


def test_choose_skew_strategy_bands():
    """VERDICT r6 task 3: the documented decision rule from
    dq_skew_profile's output to a join strategy."""
    from copperhead_spark.operators.skew import choose_skew_strategy

    # uniform: 1000 keys x 1000 rows each, hot key = mean -> plain
    assert choose_skew_strategy(1_000, 1_000_000, 1_000) == ("plain", 1)
    # 20x mean is still AQE territory (inclusive bound)
    assert choose_skew_strategy(20_000, 1_000_000, 1_000) == ("plain", 1)
    # heavy skew, broadcastable dim -> broadcast regardless of heat
    assert choose_skew_strategy(500_000, 1_000_000, 1_000, dim_rows=5_000) == (
        "broadcast",
        1,
    )
    # heavy skew, dim too big -> salt, k = ceil(top/2M) in [2, 64]
    st, k = choose_skew_strategy(500_000, 1_000_000, 1_000, dim_rows=10**9)
    assert st == "salt" and k == 2
    st, k = choose_skew_strategy(9_000_000, 10_000_000, 1_000, dim_rows=10**9)
    assert st == "salt" and k == 5
    # salts clamp at 64 even for a key holding everything
    st, k = choose_skew_strategy(10**9, 10**9, 10**6, dim_rows=10**9)
    assert st == "salt" and k == 64
    # unknown dim side: must not assume broadcastable
    st, k = choose_skew_strategy(500_000, 1_000_000, 1_000)
    assert st == "salt"
