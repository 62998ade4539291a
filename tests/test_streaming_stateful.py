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
