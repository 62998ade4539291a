"""Physical-plan audit: every registered query must compile to a plan
that survives a 100x scale-up.  This is the automated form of the
`.explain("formatted")` discipline — invariants, not golden plan text,
so Catalyst is free to improve but cannot regress into quadratic joins.

Invariants:
- no CartesianProduct anywhere;
- no BroadcastNestedLoopJoin, except queries explicitly registered as
  brute-force baselines whose documented scale path is a different
  registered query;
- parquet filters reach the scan (PushedFilters) for the predicate-
  heavy queries;
- scans of wide tables are column-pruned (ReadSchema is a strict
  subset) for the projection queries;
- whole-stage codegen covers the headline relational queries.
"""

import re

import pytest

from copperhead_spark.plans.registry import all_queries

# intentionally all-pairs baselines: each one's scale path is a separate
# registered query (LSH-bucketed), per SURVEY §7 / COVERAGE SIM1-2, D5
BNLJ_BASELINES = {
    "sim_cosine_topk": "sim_lsh_buckets",
    # the quantized sweep is deliberately all-pairs: it IS the cheap
    # shortlist generator; cluster pruning comes from sim_ivf_topk
    "sim_quantized_topk": "sim_ivf_topk",
}


# queries whose FINAL (post-AQE) plan is inspected; they are executed so
# AdaptiveSparkPlan is finalized and WholeStageCodegen spans materialize
EXECUTED = {"flagship_selection_yield", "a6_pricing_summary", "j1_star_join_revenue"}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        out = {}
        for name, q in all_queries().items():
            df = q.builder(spark, sf_dir)
            if name in EXECUTED:
                df.collect()
            out[name] = df._jdf.queryExecution().executedPlan().toString()
        return out
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_bnlj_only_in_documented_baselines(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_BASELINES
    ]
    assert not offenders, offenders
    # every whitelisted baseline's scale path must actually exist
    for scale_path in BNLJ_BASELINES.values():
        assert scale_path in plans


@pytest.mark.parametrize(
    "name",
    ["p1_conjunctive_filter", "flagship_selection_yield", "p4_interval_mask"],
)
def test_filters_reach_parquet_scan(plans, name):
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plans[name])
    assert m and m.group(1).strip(), plans[name][:2000]


@pytest.mark.parametrize(
    ("name", "table_width"),
    [
        ("a6_pricing_summary", 16),  # lineitem has 16 columns
        ("a1_count_per_group", 16),
        ("j4_top2_pivot", 16),
    ],
)
def test_scans_are_column_pruned(plans, name, table_width):
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plans[name])
    assert schemas, plans[name][:2000]
    for s in schemas:
        ncols = len([c for c in s.split(",") if ":" in c])
        assert 0 < ncols < table_width, (name, s)


@pytest.mark.parametrize(
    "name",
    ["flagship_selection_yield", "a6_pricing_summary", "j1_star_join_revenue"],
)
def test_wholestage_codegen_present(plans, name):
    # "*(n)" prefixes mark operators inside WholeStageCodegen span n
    assert re.search(r"\*\(\d+\)", plans[name]), plans[name][:2000]


def test_graph_frontier_joins_never_broadcast_edges(spark, sf_dir):
    """The iterative graph loops must move the small frontier to the
    edge partitioning (SHUFFLE_HASH), never broadcast the edge list:
    AQE left to itself measures the edge exchange under the broadcast
    threshold at test SF and picks the scale-backwards build side
    (plans/graph.py pagerank_iterations rationale).  Driven with
    collect() on the SAME QueryExecution (a noop write would wrap the
    plan in a fresh, never-finalized one) so the AQE-final plan is
    what's asserted."""
    from copperhead_spark.plans import graph as g

    ed, deg = g._edges_deg(spark, sf_dir)
    loops = {
        "pagerank_iterations": g.pagerank_iterations(ed, deg, 3),
        "lpa_iterations": g.lpa_iterations(ed, deg, 2),
    }
    for name, df in loops.items():
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, f"{name}: AQE plan not finalized"
        assert "ShuffledHashJoin" in plan, f"{name}: frontier join not SHJ"
        # broadcasts of small AGGREGATES (community sizes) are fine; a
        # broadcast that builds a raw relation (the edge list) is the
        # scale-backwards plan this test exists to forbid.  Check what
        # each BroadcastExchange BUILDS: the first real operator under
        # it must be an aggregate, not a scan.
        lines = plan.splitlines()
        passthrough = ("AQEShuffleRead", "ReusedExchange", "Exchange",
                       "WholeStageCodegen", "InputAdapter", "Project", "Filter")
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            for sub in lines[i + 1 :]:
                body = sub.strip(" :+-*()0123456789")
                if not body or any(p in sub for p in passthrough):
                    continue
                assert "HashAggregate" in sub or "ObjectHashAggregate" in sub, (
                    f"{name}: broadcast builds a non-aggregate (at scale "
                    f"that side is the 100 TB edge list)\n{ln}\n{sub}"
                )
                break
