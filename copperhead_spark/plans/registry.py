"""Query registry: the operator inventory as runnable (Spark, oracle) pairs.

Each SURVEY.md §2 ★ operator registers one named query here.  The builder
is the idiomatic-Spark implementation; ``oracle`` is ANSI SQL that DuckDB
runs over the same parquet tables (views pre-registered by the driver).
The driver compares row count + schema + order-insensitive value hash, so
every computed column is aliased identically on both sides and float
aggregates go through functions/exact.py to be bit-deterministic.

Queries with no SQL-expressible oracle (streaming, approximate algorithms
whose hash seeds aren't portable) set ``oracle=None`` → the driver records
a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# plan modules that register queries on import
_PLAN_MODULES = (
    "copperhead_spark.plans.relational",
    "copperhead_spark.plans.relational_ext",
    "copperhead_spark.plans.analytics_ext",
    "copperhead_spark.plans.windows",
    "copperhead_spark.plans.lookups",
    "copperhead_spark.plans.corrections",
    "copperhead_spark.plans.physics",
    "copperhead_spark.plans.arrays",
    "copperhead_spark.plans.timeseries",
    "copperhead_spark.plans.dedup",
    "copperhead_spark.plans.similarity",
    "copperhead_spark.plans.text",
    "copperhead_spark.plans.streaming",
    "copperhead_spark.plans.sources",
    "copperhead_spark.plans.multimodal",
    "copperhead_spark.plans.ml",
    "copperhead_spark.plans.scale_ext",
    "copperhead_spark.plans.training",
    "copperhead_spark.plans.retrieval",
    "copperhead_spark.plans.linalg",
    "copperhead_spark.plans.sketches",
    "copperhead_spark.plans.lm",
    "copperhead_spark.plans.sessions",
    "copperhead_spark.plans.graph",
    "copperhead_spark.plans.linkage",
    "copperhead_spark.plans.tokenize",
    "copperhead_spark.plans.mltrain",
    "copperhead_spark.plans.geo",
)


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()
    # local-test float tolerance; 0.0 = require bit-exact vs the oracle
    tol: float = 0.0


def register(
    name: str,
    *,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    tol: float = 0.0,
):
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
            tol=tol,
        )
        return fn

    return deco


# The driver's correctness gate reads the FIRST 50 entries of queries().
# Rounds 1-2 verified the same 50 relational/physics queries, leaving the
# dedup/similarity/sketch/text/streaming surface driver-unchecked; this
# window rotates those into the gate (round 3).  Names listed here are
# emitted first, in this order; everything else follows in registration
# order.  Rotate again next round for the remainder.
_DRIVER_WINDOW = (
    # dedup family
    "dedup_exact_groups",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_jaccard_est",
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_connected_components",
    "dedup_cluster_stats",
    "dedup_cluster_representatives",
    "dedup_semantic_clusters",
    "dedup_embedding_cosine_pairs",
    # similarity / ANN / k-means
    "sim_cosine_topk",
    "sim_lsh_buckets",
    "sim_ivf_topk",
    "sim_quantized_topk",
    "sim_ivf_recall",
    "kmeans_update_step",
    # sketches / bloom / linalg / retrieval
    "sketch_hll_distinct",
    "sketch_cms_counts",
    "bloom_semijoin_reduction",
    "emb_gram_matrix",
    "emb_random_projection",
    "text_bm25_topk",
    # text analysis / curation
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_repetition_stats",
    "text_gopher_filter",
    "text_rolling_fingerprint",
    "text_pii_redaction",
    "text_vocab_topk",
    "text_line_dedup",
    "text_sample_stratified",
    "text_train_val_test_split",
    "text_contamination_screen",
    "pipeline_corpus_curation",
    # streaming (batch-oracle checked)
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_static_join",
    "stream_dedup_watermark",
    "stream_stream_join",
    "stream_foreachbatch_sink",
    "st5_stateful_profile",
    # sources / ml / aggregates / flagship E2E not yet driver-checked
    "s3_partitioned_sink_roundtrip",
    "s4_partition_pruned_scan",
    "ml_mlp_inference",
    "a5_weighted_histogram",
    "pipeline_hmm_histogram",
)

# Snapshot (start of round 5) of the 50 queries that had never been
# driver-checked, in their round-4 emit order.  Pinning the drain order
# here means queries registered LATER (new operators) queue behind these
# and cannot displace them from the r05/r06 windows — the drain finishes
# on schedule regardless of module import order.
_DRAIN_ORDER = (
    "s13_zorder_clustered_scan",
    "s14_jsonlines_roundtrip",
    "s15_orc_roundtrip",
    "s16_csv_badrecords_scan",
    "mm_media_metadata",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_phash_dedup",
    "mm_audio_energy_windows",
    "mm_image_resize",
    "mm_phash_clusters",
    "mm_ppm_real_decode",
    "udaf_grouped_median",
    "sk1_salted_skew_agg",
    "bk1_bucketed_join_agg",
    "o4_presentation_sort",
    "fin2_group_templates",
    "fin3_datacard_yields",
    "fin1_chi2_model_selection",
    "sk2_salted_skew_join",
    "pack_sequences",
    "sample_weighted_reservoir",
    "sample_domain_mixture",
    "corpus_snapshot_diff",
    "sample_balanced_downsample",
    "retrieval_rrf_fusion",
    "emb_label_centroids",
    "text_bigram_lm_score",
    "sessionize_events",
    "session_funnel",
    "events_spike_detection",
    "events_retention_cohorts",
    "graph_pagerank",
    "graph_triangle_count",
    "graph_degree_histogram",
    "graph_kcore_members",
    "graph_label_propagation",
    "graph_clustering_coefficient",
    "text_tfidf_blocked_pairs",
    "text_bpe_pair_counts",
    "dedup_incremental_index",
    "market_basket_rules",
    "text_bpe_train_merges",
    "linkage_fuzzy_name_pairs",
    "pipeline_entity_resolution",
    "text_bpe_encode",
    "text_bpe_encode_expr8",
    "pipeline_tokenizer_train_encode",
    "text_feature_hashing",
    "ml_perceptron_train",
)

# Snapshot (start of round 6) of the round-5 additions still never
# driver-checked, in their r05 emit order: 62 entries here; 4 more
# never-checked names live at the tail of _DRAIN_ORDER above and are not
# repeated.  Same rationale as _DRAIN_ORDER: queries registered in round
# 6+ queue BEHIND these regardless of which plan module they live in, so
# the drain finishes on schedule (r06 window = those 4 tail entries +
# the first 46 below; the remaining 16 + round-6 additions drain in r07).
_DRAIN_ORDER_R6 = (
    "j19_scd2_temporal_join",
    "dq_benford_profile",
    "m1_incremental_agg_refresh",
    "dq_merkle_fingerprint",
    "a19_rollup_hierarchy",
    "a20_filtered_aggregates",
    "j18_lateral_topk_per_nation",
    "dq_chi2_independence",
    "a21_two_phase_p99",
    "w8_percent_rank_cume_dist",
    "w9_frame_first_last_nth",
    "o7_pareto_frontier",
    "w10_window_distinct_count",
    "t8_streaks_islands",
    "t9_ewma_smoothing",
    "t10_max_drawdown",
    "t11_acf_lags",
    "t12_concurrency_sweep",
    "t13_cusum_changepoint",
    "t14_theil_sen_trend",
    "pipeline_fuzzy_dedup_e2e",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "dedup_prefix_filter_pairs",
    "emb_matryoshka_topk",
    "sim_ivf_incremental_add",
    "text_pmi_collocations",
    "ml_confusion_f1",
    "sketch_cms_error_gate",
    "seg_bitmap_intersect",
    "stream_cdc_scd2_apply",
    "s17_evolving_stream_merge",
    "s18_delete_propagation",
    "dq_skew_profile",
    "s19_small_file_compaction",
    "s21_snapshot_time_travel",
    "sample_temperature_mixture",
    "sample_poisson_bootstrap",
    "text_chunk_overlap",
    "pipeline_rag_chunk_embed_topk",
    "text_tfidf_topterms",
    "emb_maxsim_topk",
    "retrieval_diversified_topk",
    "emb_power_iteration",
    "events_anomaly_mad",
    "seq_markov_transitions",
    "seq_dfa_funnel",
    "graph_bfs_distances",
    "graph_wcc_components",
    "graph_hits",
    "rec_copurchase_topk",
    "graph_bellman_ford",
    "graph_link_prediction",
    "graph_personalized_pagerank",
    "graph_random_walks",
    "ml_ols_fit",
    "ml_naive_bayes_classify",
    "ml_decision_stump",
    "ml_auc_rank",
    "ml_target_encode_loo",
    "ml_ridge_fit",
    "geo_grid_radius_join",
)


def _row_green(row: dict) -> bool:
    """A driver correctness row counts as green iff it errored nowhere and
    its strongest recorded check passed: hash for full-oracle queries,
    rows-only for oracle-less ones (hash_match is null there)."""
    if row.get("err"):
        return False
    if row.get("hash_match") is not None:
        return bool(row["hash_match"])
    return bool(row.get("rows_match"))


def _driver_status() -> dict[str, tuple[bool, int]]:
    """name -> (latest driver verdict, round of that verdict) from
    CORRECTNESS_r*.json at the repo root; later rounds overwrite earlier
    ones.  Used to auto-rotate the driver's 50-query window: the gate
    reads the FIRST 50 registered queries each round, so red retries and
    never-checked queries must lead.  Round 4 taught the hard way that
    "has any row" is not "verified": a red row (e.g. approx_aggregates,
    red since r02) would never re-enter the window under key-presence
    rotation.  Round 7 added the round number: once every query is green,
    tier 3 re-verifies the STALEST greens first (r8 verdict task 3 —
    without it the window re-checked the same head greens forever while
    r02-era greens sat un-re-verified)."""
    import glob
    import json
    import re

    root = __file__
    for _ in range(3):  # plans/ -> copperhead_spark/ -> repo root
        root = __import__("os").path.dirname(root)
    status: dict[str, tuple[bool, int]] = {}
    # lexicographic sort orders r01..r99 correctly; later files win
    for path in sorted(glob.glob(f"{root}/CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                for name, row in json.load(fh).items():
                    status[name] = (_row_green(row), rnd)
        except (OSError, ValueError):
            continue
    return status


def all_queries() -> dict[str, Query]:
    """Import all plan modules (idempotent) and return the registry.

    Output order auto-rotates the driver's correctness window: queries
    with no row in any CORRECTNESS_r*.json yet come first (within that,
    ``_DRIVER_WINDOW`` priority then registration order), already-checked
    queries follow.  Each round the driver gate therefore verifies up to
    50 previously-unverified queries with zero manual re-ordering, until
    the whole registry has driver-green rows.
    """
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # allow partial builds while modules are still being written
            if e.name and e.name.startswith("copperhead_spark"):
                continue
            raise
    priority: list[str] = [
        n
        for n in _DRIVER_WINDOW + _DRAIN_ORDER + _DRAIN_ORDER_R6
        if n in _REGISTRY
    ]
    priority += [n for n in _REGISTRY if n not in set(priority)]
    status = _driver_status()
    # four tiers, stable within each except tier 3: (0) checked but
    # latest driver row RED — retries lead so a red never lingers more
    # than one round, (1) never-checked WITH an oracle (full value
    # verification), (2) never-checked rows-only (weaker check, so they
    # take slots only once tier 1 drains), (3) latest-green verified
    # queries ordered STALEST green round first (r8: with all 282 green,
    # a static tier 3 re-verified the same head forever; oldest-first
    # makes the 50-slot window a genuine ~6-round re-verification cycle).
    ordered: dict[str, Query] = {}
    tiers = (
        lambda n: n in status and not status[n][0],
        lambda n: n not in status and _REGISTRY[n].oracle is not None,
        lambda n: n not in status,
        lambda n: True,
    )
    for i, tier in enumerate(tiers):
        names = [n for n in priority if n not in ordered and tier(n)]
        if i == 3:  # every remaining name has a green status row
            names.sort(key=lambda n: (status[n][1], priority.index(n)))
        for name in names:
            ordered[name] = _REGISTRY[name]
    return ordered
