"""Custom stateful streaming operator vs the batch oracle."""

from pyspark.sql import functions as F


def test_stateful_profile_equals_batch(spark, sf_dir):
    from copperhead_spark.catalog import table
    from copperhead_spark.streaming.events import events_stream, run_to_memory
    from copperhead_spark.streaming.stateful import user_profile_stream

    stream = events_stream(spark, sf_dir)
    out = run_to_memory(user_profile_stream(stream), mode="update")
    # update mode may emit once per micro-batch; the last emission per
    # user is the accumulated state
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("value_sum_scaled").alias("value_sum_scaled"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = table(spark, sf_dir, "events")
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_sum_scaled"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert final["n_events"].equals(batch["n_events"])
    assert final["value_sum_scaled"].equals(batch["value_sum_scaled"])  # bit-exact


def test_stream_stream_join_state_bounded_by_watermark(spark, sf_dir):
    """The 100 TB claim behind the interval join — state is EVENT-TIME
    BOUNDED, not input-bounded — asserted on state-store metrics: the
    final micro-batch must have evicted everything older than the
    watermark horizon (6h delay + 6h join interval), so retained rows
    are at most the events in the last 13h (1h slack) of the stream,
    regardless of total input size."""
    from copperhead_spark.catalog import table
    from copperhead_spark.plans.streaming import interval_join_stream
    from copperhead_spark.streaming.events import run_to_memory

    progress = []
    run_to_memory(
        interval_join_stream(spark, sf_dir), mode="append", progress=progress
    ).count()
    states = [p for p in progress if p.get("stateOperators")]
    assert len(states) >= 2, "expected a data batch plus the eviction batch"
    final = states[-1]["stateOperators"][0]
    first = states[0]["stateOperators"][0]
    assert final["numRowsRemoved"] > 0, "watermark eviction never ran"
    assert final["numRowsTotal"] < first["numRowsTotal"]

    ev = table(spark, sf_dir, "events")
    max_ts = ev.selectExpr("max(ts) AS m").first().m
    horizon_n = ev.filter(
        F.col("ts") >= F.lit(max_ts) - F.expr("INTERVAL 13 HOURS")
    ).count()
    n_events = ev.count()
    assert final["numRowsTotal"] <= horizon_n, (final["numRowsTotal"], horizon_n)
    assert final["numRowsTotal"] < n_events


def test_stateful_profile_state_is_user_bounded(spark, sf_dir):
    """st5's state contract: applyInPandasWithState holds exactly ONE
    state row per user (the profile), never per event — the metric that
    makes the operator viable when events >> users."""
    from copperhead_spark.catalog import table
    from copperhead_spark.streaming.events import events_stream, run_to_memory
    from copperhead_spark.streaming.stateful import user_profile_stream

    progress = []
    run_to_memory(
        user_profile_stream(events_stream(spark, sf_dir)),
        mode="update",
        progress=progress,
    ).count()
    states = [p for p in progress if p.get("stateOperators")]
    assert states, "no stateful progress recorded"
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    n_events = table(spark, sf_dir, "events").count()
    final = states[-1]["stateOperators"][0]
    assert final["numRowsTotal"] == n_users, (final["numRowsTotal"], n_users)
    assert final["numRowsTotal"] < n_events
