"""Every registered query must match its DuckDB oracle (bit-exact by
default) — the local mirror of the driver's CORRECTNESS gate."""

import pytest

from copperhead_spark.plans.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from copperhead_spark.testing import run_query_vs_oracle

    report = run_query_vs_oracle(spark, duck, QUERIES[name], sf_dir)
    assert report.ok, str(report)


def test_registry_nonempty():
    assert len(QUERIES) >= 1
