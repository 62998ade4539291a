"""CSV lookup ingestion + JSON/ORC interchange round-trips, and the
CSV-loaded table flowing through the binned broadcast lookup join (the
b-tag-SF-from-CSV shape, btag_weights.py:4-10)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_csv_lookup_through_binned_join(spark, tmp_path):
    from copperhead_spark.operators.lookup import binned_lookup_join
    from copperhead_spark.sources.tabular_io import read_lookup_csv

    # a 10-bin 1-D scale-factor table as a CSV file with comments
    csv = tmp_path / "sf.csv"
    lines = ["# correction v3", "bin_idx,sf"]
    sfs = [round(0.9 + 0.02 * i, 2) for i in range(10)]
    lines += [f"{i},{sf}" for i, sf in enumerate(sfs)]
    csv.write_text("\n".join(lines) + "\n")

    lookup = read_lookup_csv(spark, str(csv), "bin_idx long, sf double")
    assert lookup.count() == 10

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame({"x": rng.uniform(-5, 55, 500).round(3)})
    fact = spark.createDataFrame(pdf)
    got = (
        binned_lookup_join(fact, lookup, F.col("x"), lo=0.0, width=5.0, nbins=10)
        .select("x", "sf")
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    bins = np.clip(np.floor(pdf["x"] / 5.0).astype(int), 0, 9)
    expect = pdf.assign(sf=[sfs[b] for b in bins]).sort_values("x").reset_index(drop=True)
    assert (got["sf"] == expect["sf"]).all()

    # plan shape: broadcast equi-join, not a nested-loop range probe
    plan = (
        binned_lookup_join(fact, lookup, F.col("x"), 0.0, 5.0, 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_csv_failfast_on_corrupt_rows(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    from copperhead_spark.sources.tabular_io import read_lookup_csv

    csv = tmp_path / "bad.csv"
    csv.write_text("bin_idx,sf\n0,1.0\nnot_a_number,oops\n")
    with pytest.raises(Py4JJavaError):
        read_lookup_csv(spark, str(csv), "bin_idx long, sf double").collect()


def test_json_roundtrip(spark, sf_dir, tmp_path):
    from copperhead_spark.catalog import table
    from copperhead_spark.sources.tabular_io import read_json, write_json

    nat = table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_json")
    write_json(nat, out)
    back = read_json(spark, out, nat.schema)
    a = nat.toPandas().sort_values("n_nationkey").reset_index(drop=True)
    b = back.toPandas().sort_values("n_nationkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from copperhead_spark.catalog import table
    from copperhead_spark.sources.tabular_io import read_orc, write_orc

    reg = table(spark, sf_dir, "region")
    out = str(tmp_path / "region_orc")
    write_orc(reg, out)
    back = read_orc(spark, out)
    a = reg.toPandas().sort_values("r_regionkey").reset_index(drop=True)
    b = back.toPandas().sort_values("r_regionkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
