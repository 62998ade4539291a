"""Training-data assembly operators (beyond-reference capability, same
family as plans/text.py): sequence packing into fixed context windows and
benchmark decontamination screening.

Scale design (100 TB corpus):
- packing is PER-SHARD: the window cumsum runs inside hash shards, never
  as one global sort, so the plan is one shuffle on (shard) with 100%
  parallelism; pack ids are (shard, seq) pairs, globally unique without
  coordination.
- decontamination joins the corpus against a BROADCAST benchmark n-gram
  set: the 100 TB side is never shuffled — explode is map-side, the join
  is map-side, only the (tiny) matched-pair aggregate shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.text import (
    rolling_fingerprint_duck,
    rolling_fingerprint_spark,
    token_hashes_duck,
    token_hashes_spark,
    token_ngram_hashes_duck,
    token_ngram_hashes_spark,
)
from copperhead_spark.operators.barrier import project_once
from copperhead_spark.plans.registry import register

_CTX = 2048  # context window (tokens)
_NSHARDS = 32
_PACK_STRIDE = 1_000_000  # pack_id = shard * stride + seq-within-shard


@register(
    "pack_sequences",
    oracle=f"""
SELECT doc_id, n_tokens, shard,
       CAST(shard * {_PACK_STRIDE} + (off // {_CTX}) AS BIGINT) AS pack_id,
       CAST(off % {_CTX} AS BIGINT) AS offset_in_pack
FROM (
  SELECT doc_id, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS off
  FROM (
    SELECT doc_id,
           CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           doc_id % {_NSHARDS} AS shard
    FROM documents
  )
)
""",
    tags=("text", "training", "W4"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    deterministic order and split into fixed {_CTX}-token context
    windows; each doc is assigned the pack holding its first token plus
    its offset inside that pack.  The cumsum runs PER SHARD (doc_id mod
    {_NSHARDS}) — a global ORDER BY would serialize 100 TB through one
    partition; per-shard packing keeps every shard independent and the
    pack ids disjoint by construction."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tokens"),
        (F.col("doc_id") % _NSHARDS).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off")
    return base.select("doc_id", "n_tokens", "shard", off).select(
        "doc_id",
        "n_tokens",
        "shard",
        (F.col("shard") * _PACK_STRIDE + F.expr(f"off div {_CTX}")).alias("pack_id"),
        (F.col("off") % _CTX).alias("offset_in_pack"),
    )


_NGRAM = 8
_BENCH_MOD = 11  # benchmark set: doc_id % 11 == 0 (deterministic stand-in)


def _contamination_oracle() -> str:
    th = token_hashes_duck("text")
    grams = token_ngram_hashes_duck(_NGRAM, "th")
    return f"""
WITH th AS (SELECT doc_id, {th} AS th FROM documents),
g AS (SELECT doc_id, list_distinct({grams}) AS grams FROM th),
ben AS (
  SELECT doc_id AS bench_id, length(grams) AS n_bench, unnest(grams) AS gram
  FROM g WHERE doc_id % {_BENCH_MOD} = 0
),
cor AS (SELECT doc_id, unnest(grams) AS gram FROM g)
SELECT c.doc_id, b.bench_id,
       COUNT(*) AS n_shared,
       CAST(COUNT(*) AS DOUBLE) / b.n_bench AS containment
FROM cor c JOIN ben b USING (gram)
WHERE c.doc_id <> b.bench_id
GROUP BY c.doc_id, b.bench_id, b.n_bench
"""


@register(
    "text_contamination_screen",
    oracle=_contamination_oracle(),
    tags=("text", "training", "dedup"),
)
def text_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination screen: token {_NGRAM}-gram containment
    of each benchmark document inside each corpus document (the standard
    n-gram-overlap contamination test for training corpora).  The
    benchmark n-gram set is tiny and BROADCAST, so the corpus side stays
    map-side: tokenize -> n-gram -> explode -> broadcast-join; only the
    matched pairs (a vanishing fraction) reach the shuffle.  n-grams are
    array_distinct per doc, so COUNT(*) per pair IS the distinct shared
    count; containment = n_shared / |bench grams|."""
    docs = table(spark, sf_dir, "documents")
    th = project_once(docs, "doc_id", f"{token_hashes_spark()} AS th")
    grams = project_once(
        th,
        "doc_id",
        f"array_distinct({token_ngram_hashes_spark(_NGRAM, 'th')}) AS grams",
    )
    ben = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.size("grams").cast("long").alias("n_bench"),
            F.explode("grams").alias("gram"),
        )
    )
    cor = grams.select("doc_id", F.explode("grams").alias("gram"))
    return (
        cor.join(F.broadcast(ben), "gram")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id", "n_bench")
        .agg(F.count("*").alias("n_shared"))
        .select(
            "doc_id",
            "bench_id",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_bench")).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis-Spirakis A-Res): sample k docs
# with probability proportional to a quality weight, deterministically.
# key_i = u_i^(1/w_i) with u_i a hash-uniform; taking the k LARGEST keys
# is exactly weighted sampling without replacement.  We rank by the
# monotone-equivalent ln(u)/w, quantized to 1e-12 with a doc_id
# tie-break so the two engines' last-ulp ln() differences cannot flip
# the ordering.
# ---------------------------------------------------------------------------

_RES_K = 40
_RES_P = 2_147_483_647  # Mersenne prime; same hash family as operators/rochester.py


def _res_score_sql(key: str, weight: str) -> str:
    """ROUND(ln(u)/w * 1e12) — identical text for Spark and DuckDB."""
    h = f"((({key}) % {_RES_P}) * 1013904223 + 7 * 1664525) % {_RES_P}"
    u = f"(CAST(({h}) + 1 AS DOUBLE) / {float(_RES_P + 1)})"
    return f"CAST(ROUND(LN({u}) / CAST({weight} AS DOUBLE) * 1e12) AS BIGINT)"


@register(
    "sample_weighted_reservoir",
    oracle=f"""
SELECT doc_id, n_chars
FROM documents
ORDER BY {_res_score_sql("doc_id", "n_chars")} DESC, doc_id ASC
LIMIT {_RES_K}
""",
    tags=("text", "training", "O3"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample: {_RES_K} documents drawn
    with probability proportional to n_chars (the A-Res scheme — rank by
    u^(1/w), keep the top k).  The hash-uniform replaces np.random so the
    sample is reproducible and partitioning-independent; orderBy+limit
    compiles to TakeOrderedAndProject — every partition keeps its local
    top-k and the driver merges k-sized heaps, which IS the distributed
    reservoir merge (no global sort, no single reducer, 100 TB safe)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id", "n_chars", f"{_res_score_sql('doc_id', 'n_chars')} AS _score"
        )
        .orderBy(F.col("_score").desc(), F.col("doc_id").asc())
        .limit(_RES_K)
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# temperature-weighted domain mixture sampling: the "source mixing" step
# of pretraining-data assembly (UniMax / Pile-style): per-source sampling
# rates proportional to (token mass)^(1/T), normalized so the heaviest
# source keeps everything; documents kept by a deterministic hash-uniform
# against their source's rate.  T=2 means exponent 0.5 = SQRT, which is
# IEEE-exact, so the whole query is bit-deterministic (general T would
# need POW routed through fixed-point rounding like LN elsewhere).
#
# Scale: per-source mass is one vocabulary-sized aggregate (20 rows);
# rates broadcast back; the keep filter is map-only — the corpus is
# scanned twice and never shuffled.
# ---------------------------------------------------------------------------

_MIX_P = 2_147_483_647


def _mix_u_sql(key: str) -> str:
    """Hash-uniform in (0,1] from the repo's LCG family — identical text
    on both engines."""
    h = f"((({key}) % {_MIX_P}) * 1013904223 + 11 * 1664525) % {_MIX_P}"
    return f"(CAST(({h}) + 1 AS DOUBLE) / {float(_MIX_P + 1)})"


_MIX_RATE_SQL = (
    "SQRT(CAST(mass AS DOUBLE)) / SQRT(CAST(max_mass AS DOUBLE))"
)


@register(
    "sample_domain_mixture",
    oracle=f"""
WITH m AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
  FROM documents GROUP BY source
),
r AS (
  SELECT source, {_MIX_RATE_SQL} AS rate
  FROM m CROSS JOIN (SELECT MAX(mass) AS max_mass FROM m)
)
SELECT d.doc_id, d.source, r.rate
FROM documents d JOIN r USING (source)
WHERE {_mix_u_sql("d.doc_id")} < r.rate
""",
    tags=("text", "training"),
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (T=2) domain mixture sample: keep each doc
    with probability sqrt(source token mass) / sqrt(max source mass),
    decided by a reproducible hash-uniform on doc_id — the sample is
    independent of partitioning and stable across appends of other
    sources' data."""
    docs = table(spark, sf_dir, "documents")
    mass = docs.groupBy("source").agg(F.sum("n_chars").cast("long").alias("mass"))
    # the global max is one scalar: materialize it driver-side and inline
    # as a literal (the scalar-subquery execution model) — a literal-key
    # broadcast join would constant-fold back into a BNLJ
    max_mass = int(mass.agg(F.max("mass")).first()[0])
    rates = mass.selectExpr(
        "source", "mass", f"CAST({max_mass} AS BIGINT) AS max_mass"
    ).selectExpr("source", f"{_MIX_RATE_SQL} AS rate")
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(F.expr(f"{_mix_u_sql('doc_id')} < rate"))
        .select("doc_id", "source", "rate")
    )


# ---------------------------------------------------------------------------
# corpus snapshot diff: the CDC-shaped "what changed between corpus v1
# and v2" operator behind incremental training-data refreshes — added /
# removed / modified / unchanged per doc_id, with change detection by
# content fingerprint rather than full-text compare.
#
# The two snapshots are carved deterministically from the fixture
# (v1 drops doc_id % 11 == 0, v2 drops doc_id % 13 == 0 and rewrites
# text for doc_id % 5 == 0), so both engines diff identical inputs.
#
# Scale: one full-outer hash join on the snapshot key; both sides carry
# only (doc_id, fingerprint) — bytes per row are tens, not the document
# body, so 100 TB of corpus diffs as ~tens of GB of shuffle.  The
# fingerprint is the repo's portable rolling hash (functions/text.py),
# computed map-side before the join.
# ---------------------------------------------------------------------------


def _snapshot_sql(engine: str, version: int) -> str:
    """v1/v2 carve-outs with identical expression text per engine."""
    mod = 11 if version == 1 else 13
    text = (
        "text"
        if version == 1
        else "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v2') ELSE text END"
    )
    return f"SELECT doc_id, {text} AS text FROM documents WHERE doc_id % {mod} <> 0"


@register(
    "corpus_snapshot_diff",
    oracle=f"""
WITH v1 AS (SELECT doc_id, {rolling_fingerprint_duck("text")} AS fp
            FROM ({_snapshot_sql("duck", 1)})),
v2 AS (SELECT doc_id, {rolling_fingerprint_duck("text")} AS fp
       FROM ({_snapshot_sql("duck", 2)}))
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.fp <> v2.fp THEN 'modified'
            ELSE 'unchanged' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.fp <> v2.fp
""",
    tags=("text", "training", "sources"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff: full-outer join of two
    fingerprint projections keyed on doc_id, emitting only changed rows
    (added/removed/modified) — the incremental-refresh changelog.  The
    'unchanged' majority is filtered pre-shuffle-free (post-join
    predicate on the tiny fingerprint columns)."""
    docs = table(spark, sf_dir, "documents")

    def snap(version: int) -> DataFrame:
        # same carve-outs as _snapshot_sql, built with DataFrame ops so no
        # session-level 'documents' view is clobbered as a side effect
        mod = 11 if version == 1 else 13
        text = (
            "text"
            if version == 1
            else "CASE WHEN doc_id % 5 = 0 THEN concat(text, ' v2') ELSE text END"
        )
        return (
            docs.filter(f"doc_id % {mod} <> 0")
            .selectExpr("doc_id", f"{text} AS text")
            .selectExpr("doc_id", f"{rolling_fingerprint_spark('text')} AS fp")
        )

    v1, v2 = snap(1).alias("v1"), snap(2).alias("v2")
    joined = v1.join(v2, F.col("v1.doc_id") == F.col("v2.doc_id"), "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("v1.doc_id"), F.col("v2.doc_id")).alias("doc_id"),
            F.when(F.col("v1.doc_id").isNull(), "added")
            .when(F.col("v2.doc_id").isNull(), "removed")
            .when(F.col("v1.fp") != F.col("v2.fp"), "modified")
            .otherwise("unchanged")
            .alias("status"),
        )
        .filter(F.col("status") != "unchanged")
    )


# ---------------------------------------------------------------------------
# class-balanced downsampling
# ---------------------------------------------------------------------------

_BAL_SALT = "104729"


def _bal_u(key: str) -> str:
    from copperhead_spark.operators.rochester import hash_uniform_sql

    return hash_uniform_sql(key, _BAL_SALT)


@register(
    "sample_balanced_downsample",
    oracle=f"""
WITH sz AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
m AS (SELECT MIN(n) AS m FROM sz),
r AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY {_bal_u("vec_id")} ASC, vec_id ASC) AS rk
  FROM embeddings
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(vec_id) AS BIGINT) AS kept_id_sum
FROM r, m WHERE rk <= m
GROUP BY label
""",
    tags=("T17", "sampling", "ml"),
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-size rows, chosen by a per-label rank over the
    deterministic hash uniform — the rebalancing step before training a
    classifier on skewed labels, reproducible under any partitioning
    (randomSplit/sample are not) and stable under appends of OTHER
    classes.  The min class size ships as a literal (one tiny
    pre-aggregate, scalar-subquery pattern); the per-label rank is one
    window over the label partition.  The id-sum checksum pins the exact
    kept SET, not just its size.  At 100 TB: same plan, label-partition
    windows; for extreme per-label volumes swap rank for the
    hash-threshold filter (text_sample_stratified) at the cost of
    approximate counts."""
    emb = table(spark, sf_dir, "embeddings")
    m = emb.groupBy("label").count().agg(F.min("count")).first()[0]
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(
        F.expr(_bal_u("vec_id")).asc(), F.col("vec_id").asc()
    )
    kept = emb.select("label", "vec_id").withColumn(
        "rk", F.row_number().over(w)
    ).filter(F.col("rk") <= int(m))
    return kept.groupBy("label").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("vec_id").cast("long").alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# temperature-scaled domain mixture (the multilingual/mixture sampling
# rule: p_i ∝ n_i^alpha with alpha = 0.5, flattening the domain
# distribution toward the tail).  Float sqrt is IEEE-correctly-rounded
# and therefore engine-portable for a SINGLE value, but SUMMING floats
# is order-dependent — so each domain's sqrt is fixed-pointed to e6
# FIRST and the normalization runs in exact integer arithmetic.
# ---------------------------------------------------------------------------


@register(
    "sample_temperature_mixture",
    oracle="""
WITH d AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
           AS sqrt_e6
  FROM documents GROUP BY lang
),
t AS (SELECT CAST(SUM(sqrt_e6) AS BIGINT) AS tot,
             CAST(SUM(n_docs) AS BIGINT) AS n_total FROM d)
SELECT lang, n_docs,
       CAST((1000000 * sqrt_e6) // tot AS BIGINT) AS weight_e6,
       CAST((n_total * sqrt_e6) // tot AS BIGINT) AS target_docs
FROM d CROSS JOIN t
""",
    tags=("training", "sampling"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling weights per language domain (alpha = 0.5):
    weight_i = sqrt(n_i) / sum_j sqrt(n_j), emitted in e6 fixed point,
    plus the resulting per-domain target document count at unchanged
    corpus size.  This is the standard low-resource-upsampling rule for
    multilingual pretraining mixes.  Exactness: sqrt(bigint) is one
    correctly-rounded libm call (portable); each domain's sqrt is
    floored to integer e6 BEFORE any summation, so the normalizing total
    and the divisions are pure integer arithmetic — no float-summation
    order dependence on either engine.  Scale: one partial-agg exchange
    over domains, then unpartitioned window sums over the AGGREGATED
    table only (dozens of domain rows in one partition — a plain
    expression, not a join; the corpus itself is never windowed)."""
    docs = table(spark, sf_dir, "documents")
    d = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
    ).selectExpr(
        "lang",
        "n_docs",
        "CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"
        " AS sqrt_e6",
    )
    d = d.selectExpr(
        "lang",
        "n_docs",
        "sqrt_e6",
        "SUM(sqrt_e6) OVER () AS tot",
        "SUM(n_docs) OVER () AS n_total",
    )
    return d.selectExpr(
        "lang",
        "n_docs",
        "CAST(1000000 * sqrt_e6 DIV tot AS BIGINT) AS weight_e6",
        "CAST(n_total * sqrt_e6 DIV tot AS BIGINT) AS target_docs",
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap resampling (deterministic hash draws)
# ---------------------------------------------------------------------------

# cumulative Poisson(1) CDF thresholds; identical literal text on both
# engines means identical doubles, so every row's replicate count is
# engine-portable
_POIS_CUM = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
)
_POIS_SALT = 104729


def _pois_count_sql(u: str) -> str:
    whens = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CUM)
    )
    return f"CASE {whens} ELSE {len(_POIS_CUM)} END"


def _pois_oracle() -> str:
    from copperhead_spark.operators.rochester import hash_uniform_sql

    u = hash_uniform_sql("o_orderkey", str(_POIS_SALT))
    return f"""
WITH drawn AS (
  SELECT o_orderpriority,
         CAST({_pois_count_sql(u)} AS BIGINT) AS c,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orig,
       CAST(SUM(c) AS BIGINT) AS n_boot,
       CAST(SUM(cents) AS BIGINT) AS orig_sum_c,
       CAST(SUM(c * cents) AS BIGINT) AS boot_sum_c
FROM drawn GROUP BY o_orderpriority
"""


@register("sample_poisson_bootstrap", oracle=_pois_oracle(), tags=("sampling",))
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Poisson(lambda=1) bootstrap replicate of the order book,
    aggregated per priority class: each row's replicate multiplicity is
    drawn by inverting the Poisson CDF at a deterministic per-key hash
    uniform (the rand_hash_uniform generator), so the 'random' resample
    is bit-reproducible on any engine, partitioning, or retry — the
    property production bootstrap pipelines need for audit and replay.

    This is THE scalable bootstrap: no data is replicated (the
    multiplicity is a weight in the aggregate, SUM(c*x) not explode),
    so a 100 TB resample costs one map-side expression + one
    partial-agg shuffle to a handful of group rows.  B replicates =
    B salts in one pass.  Sums are exact integer cents (functions/
    exact.py discipline).

    Reference analogue: the deterministic random smearing seam
    (rochester.py:8-9) — same hash-uniform machinery, applied to
    resampling instead of momentum smear."""
    from copperhead_spark.operators.rochester import hash_uniform_sql

    u = hash_uniform_sql("o_orderkey", str(_POIS_SALT))
    drawn = table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority",
        f"CAST({_pois_count_sql(u)} AS BIGINT) AS c",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents",
    )
    return drawn.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orig"),
        F.sum("c").cast("long").alias("n_boot"),
        F.sum("cents").cast("long").alias("orig_sum_c"),
        F.sum(F.col("c") * F.col("cents")).cast("long").alias("boot_sum_c"),
    )


# ---------------------------------------------------------------------------
# THE pretraining-corpus pipeline as ONE query: quality gate -> lang-ID
# routing -> fuzzy dedup (among survivors) -> benchmark decontamination
# -> temperature mixture -> sequence packing -> per-language audit.
# Every stage is an already-oracle-checked operator; this registers the
# six-stage COMPOSITION under one full-value oracle — the single query a
# 100 TB pretraining customer actually runs between "raw crawl" and
# "token shards".
# ---------------------------------------------------------------------------

_E2E_DECON_T = 0.5  # drop docs with >= 50% benchmark 8-gram containment
_E2E_MIX_SALT = "15485863"  # mixture hash-uniform salt (distinct stream)


def _pretrain_e2e_oracle() -> str:
    from copperhead_spark.operators.rochester import hash_uniform_sql
    from copperhead_spark.plans.dedup import _LSH_ORACLE
    from copperhead_spark.plans.text import _gopher_pass, _langid_case

    u = hash_uniform_sql("doc_id", _E2E_MIX_SALT)
    return f"""
WITH RECURSIVE
q AS (
  SELECT doc_id, {_langid_case("duck")} AS plang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE {_gopher_pass("duck")}
),
pairs AS ({_LSH_ORACLE}),
qe AS (
  SELECT p.doc1 AS a, p.doc2 AS b FROM pairs p
  JOIN q q1 ON q1.doc_id = p.doc1 JOIN q q2 ON q2.doc_id = p.doc2
),
edges AS (SELECT a, b FROM qe UNION ALL SELECT b AS a, a AS b FROM qe),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM q
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
cc AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
dd AS (SELECT q.* FROM q JOIN cc USING (doc_id) WHERE doc_id = component),
cont AS ({_contamination_oracle()}),
bad AS (SELECT DISTINCT doc_id FROM cont WHERE containment >= {_E2E_DECON_T}),
s4 AS (
  SELECT dd.* FROM dd
  WHERE dd.doc_id % {_BENCH_MOD} <> 0
    AND dd.doc_id NOT IN (SELECT doc_id FROM bad)
),
m AS (SELECT plang, COUNT(*) AS n FROM s4 GROUP BY plang),
r AS (
  SELECT plang, SQRT(CAST(n AS DOUBLE)) / SQRT(CAST(max_n AS DOUBLE)) AS rate
  FROM m CROSS JOIN (SELECT MAX(n) AS max_n FROM m)
),
s5 AS (SELECT s4.* FROM s4 JOIN r USING (plang) WHERE {u} < r.rate),
packed AS (
  SELECT doc_id, plang, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS off
  FROM (SELECT s5.*, doc_id % {_NSHARDS} AS shard FROM s5)
)
SELECT plang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT shard * {_PACK_STRIDE} + off // {_CTX}) AS BIGINT)
         AS n_packs,
       CAST(SUM(off % {_CTX}) AS BIGINT) AS offset_checksum,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM packed GROUP BY plang
"""


@register(
    "pipeline_pretrain_corpus_e2e",
    oracle=_pretrain_e2e_oracle(),
    tags=("text", "training", "dedup", "pipeline"),
)
def pipeline_pretrain_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus assembly END TO END, one plan, one oracle:

    1. Gopher-style quality gate (row predicate, zero shuffle);
    2. lang-ID routing (marker-ratio argmax — the PREDICTED language,
       not the labeled column, drives the mixture downstream, so the
       router is load-bearing);
    3. fuzzy dedup among survivors: LSH candidate pairs restricted to
       quality-passed endpoints, hash-min connected components, keep
       each cluster's min-doc_id canonical;
    4. benchmark decontamination: drop the benchmark carve-out itself
       plus any doc with >= {_E2E_DECON_T} 8-gram containment against a
       benchmark doc (broadcast n-gram screen);
    5. temperature mixture (T=2): per predicted language keep docs at
       rate sqrt(n)/sqrt(max n) via a deterministic hash uniform;
    6. sequence packing: per-shard token cumsum into {_CTX}-token packs.

    The audit row per language pins every stage: n_docs/id_checksum move
    if any filter shifts, offset_checksum pins each survivor's exact
    byte position in the pack stream (any dedup/mixture change re-flows
    every downstream offset in its shard), n_packs pins the pack count.

    Scale: stages 1-2 fuse into the scan; stage 3 costs the banding
    shuffle + O(diameter) CC rounds on the (tiny) pair graph; stage 4 is
    a broadcast semi-join (corpus never shuffled); stage 5 is one
    ~|langs|-row aggregate + broadcast filter; stage 6 is one shuffle on
    {_NSHARDS} hash shards.  Net: three corpus-wide exchanges at 100 TB,
    none keyed on a skewable value."""
    from copperhead_spark.operators.graph import connected_components
    from copperhead_spark.operators.rochester import hash_uniform_sql
    from copperhead_spark.plans.dedup import dedup_minhash_lsh_pairs
    from copperhead_spark.plans.text import (
        _doc_stats,
        _GOPHER_SCALAR_PASS,
        _langid_case,
    )

    docs = table(spark, sf_dir, "documents")
    q = (
        _doc_stats(docs, ["doc_id", f"({_langid_case('spark')}) AS plang"])
        .filter(F.expr(_GOPHER_SCALAR_PASS))
        .selectExpr("doc_id", "plang", "CAST(ntok AS BIGINT) AS n_tokens")
    )
    qids = q.select("doc_id")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc1", "doc2")
    pairs_q = pairs.join(
        qids.withColumnRenamed("doc_id", "doc1"), "doc1"
    ).join(qids.withColumnRenamed("doc_id", "doc2"), "doc2")
    cc = connected_components(
        qids, pairs_q, node_col="doc_id", src_col="doc1", dst_col="doc2"
    )
    dd = (
        q.join(cc, "doc_id")
        .filter(F.col("doc_id") == F.col("component"))
        .drop("component")
    )
    bad = (
        text_contamination_screen(spark, sf_dir)
        .filter(F.col("containment") >= _E2E_DECON_T)
        .select("doc_id")
        .distinct()
    )
    s4 = dd.filter(F.col("doc_id") % _BENCH_MOD != 0).join(
        bad, "doc_id", "left_anti"
    )
    m = s4.groupBy("plang").agg(F.count("*").alias("n"))
    # scalar-subquery pattern (see sample_domain_mixture): the global max
    # is one literal, not a constant-key join that would fold to a BNLJ.
    # max(n) is NULL when every doc was filtered out upstream — treat as
    # 0 so the query returns an empty frame instead of raising int(None).
    max_n = int(m.agg(F.max("n")).first()[0] or 0)
    rates = m.selectExpr(
        "plang",
        f"SQRT(CAST(n AS DOUBLE)) / SQRT(CAST({max_n} AS DOUBLE)) AS rate",
    )
    u = hash_uniform_sql("doc_id", _E2E_MIX_SALT)
    s5 = (
        s4.join(F.broadcast(rates), "plang")
        .filter(F.expr(f"{u} < rate"))
        .withColumn("shard", F.col("doc_id") % _NSHARDS)
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    packed = s5.withColumn(
        "off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return packed.groupBy("plang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct(
            F.col("shard") * _PACK_STRIDE + F.expr(f"off div {_CTX}")
        ).cast("long").alias("n_packs"),
        F.sum(F.col("off") % _CTX).cast("long").alias("offset_checksum"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# T5-style span corruption statistics (the denoising-objective prep step:
# which token spans get masked, at what ratio).  Deterministic block
# variant: tokens are grouped into fixed _SC_BLOCK-token blocks and a
# whole block is masked iff its hash uniform < _SC_RATE — parallel and
# engine-portable, where sequential span sampling would serialize.
# ---------------------------------------------------------------------------

_SC_BLOCK = 3
_SC_RATE = 0.15
_SC_SALT = "524287"


def _sc_u(block_expr: str) -> str:
    from copperhead_spark.operators.rochester import hash_uniform_sql

    return hash_uniform_sql(f"doc_id * 131071 + ({block_expr})", _SC_SALT)


@register(
    "text_span_corruption",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens,
         list_filter(range(0, (n_tokens + {_SC_BLOCK} - 1) // {_SC_BLOCK}),
                     b -> {_sc_u("b")} < {_SC_RATE}) AS masked_blocks
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(len(masked_blocks) AS BIGINT) AS n_spans,
       CAST(list_aggregate(list_transform(masked_blocks,
            b -> least(n_tokens - b * {_SC_BLOCK}, {_SC_BLOCK})), 'sum')
         AS BIGINT) AS n_masked,
       CAST(list_aggregate(masked_blocks, 'sum') AS BIGINT) AS block_checksum
FROM b
WHERE len(masked_blocks) > 0
""",
    tags=("text", "training"),
)
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption masking stats (T5/UL2 denoising prep): each doc's
    tokens are cut into {_SC_BLOCK}-token blocks; a block is masked iff
    its per-(doc, block) hash uniform < {_SC_RATE} — the mask is a pure
    function of (doc_id, block), so shards can mask independently with
    no RNG state, and a rerun or engine change reproduces the exact
    corpus.  Emits spans/masked-token counts and a block-index checksum
    (pins WHICH blocks masked, not just how many).  Map-only — the
    lambda-HOF pipeline fuses into the scan; zero shuffle at any
    scale."""
    docs = table(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
    ).selectExpr(
        "doc_id",
        "n_tokens",
        f"filter(sequence(0, CAST((n_tokens + {_SC_BLOCK} - 1) DIV {_SC_BLOCK}"
        f" - 1 AS BIGINT)), b -> {_sc_u('b')} < {_SC_RATE}) AS masked_blocks",
    )
    return base.filter(F.expr("size(masked_blocks) > 0")).selectExpr(
        "doc_id",
        "n_tokens",
        "CAST(size(masked_blocks) AS BIGINT) AS n_spans",
        f"CAST(aggregate(masked_blocks, CAST(0 AS BIGINT), (a, b) ->"
        f" a + least(n_tokens - b * {_SC_BLOCK}, {_SC_BLOCK})) AS BIGINT)"
        " AS n_masked",
        "CAST(aggregate(masked_blocks, CAST(0 AS BIGINT), (a, b) -> a + b)"
        " AS BIGINT) AS block_checksum",
    )


# ---------------------------------------------------------------------------
# quality-curriculum bucketing: order the corpus into NTILE deciles by a
# deterministic quality proxy and publish per-decile composition — the
# "feed cleaner data later in training" curriculum table.
# ---------------------------------------------------------------------------


@register(
    "sample_quality_curriculum",
    oracle="""
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(NTILE(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT)
           AS decile
  FROM documents
)
GROUP BY decile
""",
    tags=("training", "sampling", "W1"),
)
def sample_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: NTILE(10) deciles over a deterministic
    quality proxy (n_chars, doc_id tie-break so bucket boundaries are
    engine-exact), with per-decile size/range/token-mass and an
    id-checksum that pins the exact membership of every bucket.

    Scale note: NTILE over a global ORDER BY is a single-partition sort
    — correct here because the windowed relation is (doc_id, n_chars),
    tens of bytes a row, NOT the corpus body (the 100 TB text never
    enters the window; it is joined back by id if bodies are needed).
    For corpora where even the id list overflows one task, the
    production swap is bucketing by approx percentile edges
    (a8_quantiles), at the cost of exact decile sizes."""
    docs = table(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    slim = docs.selectExpr(
        "doc_id",
        "n_chars",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
    ).withColumn("decile", F.ntile(10).over(w).cast("long"))
    return slim.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )

# ---------------------------------------------------------------------------
# Model-in-the-loop curation flagship: train a quality classifier on a
# labeled carve-out, apply it as a map-only corpus filter, mix + pack the
# survivors.  The standard production curation shape (fastText/logreg
# quality classifier -> threshold -> mixture) — the expensive gold signal
# is computed once on the small labeled set, the 100 TB corpus only ever
# pays the cheap feature + a literal linear score.
# ---------------------------------------------------------------------------

_CUR_LABEL_MOD = 13  # doc_id % 13 == 0 is the labeled carve-out
_CUR_MIX_SALT = "32452843"  # mixture hash-uniform salt (distinct stream)
_CUR_DIVERSITY_T = "0.45e0"  # gold label: unique-token ratio >= 0.45


def _cur_xy(dialect: str) -> tuple[str, str]:
    """(feature, gold label) SQL per dialect.  The feature is CHEAP
    (token count / 100 — integer-derived, so the double is bit-identical
    across engines); the gold label is the EXPENSIVE lexical-diversity
    rule (distinct-token ratio) a production pipeline can only afford on
    the labeled subset."""
    nt = (
        "CAST(size(split(text, ' ')) AS DOUBLE)"
        if dialect == "spark"
        else "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    )
    uniq = (
        "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)"
        if dialect == "spark"
        else "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    )
    x = f"{nt} / 1e2"
    y = (
        f"CASE WHEN {uniq} / {nt} >= {_CUR_DIVERSITY_T}"
        " THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
    )
    return x, y


def _curation_oracle() -> str:
    from copperhead_spark.operators.rochester import hash_uniform_sql
    from copperhead_spark.plans.mltrain import _LOGREG_SOLVE

    x, y = _cur_xy("duck")
    u = hash_uniform_sql("doc_id", _CUR_MIX_SALT)
    return f"""
WITH lab AS (
  SELECT {x} AS x, {y} AS y FROM documents
  WHERE doc_id % {_CUR_LABEL_MOD} = 0
),
st0 AS (
  SELECT COUNT(*) * 250000 AS s0,
         SUM(CAST(ROUND(0.25e0 * x * 1e6) AS BIGINT)) AS s1,
         SUM(CAST(ROUND(0.25e0 * x * x * 1e6) AS BIGINT)) AS s2,
         SUM(CAST(ROUND((y - 0.5e0) * 1e6) AS BIGINT)) AS g0,
         SUM(CAST(ROUND((y - 0.5e0) * x * 1e6) AS BIGINT)) AS g1,
         CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1
  FROM lab
),
beta1 AS (SELECT {_LOGREG_SOLVE} FROM st0),
p1 AS (
  SELECT lab.y, lab.x,
         CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + EXP(-(b.b0 + b.b1 * lab.x))) AS p,
         b.b0, b.b1
  FROM lab, beta1 b
),
st1 AS (
  SELECT SUM(CAST(ROUND(p * (1e0 - p) * 1e6) AS BIGINT)) AS s0,
         SUM(CAST(ROUND(p * (1e0 - p) * x * 1e6) AS BIGINT)) AS s1,
         SUM(CAST(ROUND(p * (1e0 - p) * x * x * 1e6) AS BIGINT)) AS s2,
         SUM(CAST(ROUND((y - p) * 1e6) AS BIGINT)) AS g0,
         SUM(CAST(ROUND((y - p) * x * 1e6) AS BIGINT)) AS g1,
         MIN(b0) AS b0, MIN(b1) AS b1
  FROM p1
),
beta2 AS (SELECT {_LOGREG_SOLVE} FROM st1),
corpus AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {x} AS x
  FROM documents WHERE doc_id % {_CUR_LABEL_MOD} <> 0
),
kept AS (
  SELECT c.doc_id, c.lang, c.n_tokens
  FROM corpus c, beta2 b
  WHERE CAST(ROUND((b.b0 + b.b1 * c.x) * 1e6) AS BIGINT) >= 0
),
m AS (SELECT lang, COUNT(*) AS n FROM kept GROUP BY lang),
r AS (
  SELECT lang, SQRT(CAST(n AS DOUBLE)) / SQRT(CAST(max_n AS DOUBLE)) AS rate
  FROM m CROSS JOIN (SELECT MAX(n) AS max_n FROM m)
),
s5 AS (SELECT kept.* FROM kept JOIN r USING (lang) WHERE {u} < r.rate),
packed AS (
  SELECT doc_id, lang, n_tokens, shard,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS off
  FROM (SELECT s5.*, doc_id % {_NSHARDS} AS shard FROM s5)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT shard * {_PACK_STRIDE} + off // {_CTX}) AS BIGINT)
         AS n_packs,
       CAST(SUM(off % {_CTX}) AS BIGINT) AS offset_checksum,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       (SELECT CAST(ROUND(b0 * 1e9) AS BIGINT) / 1e9 FROM beta2) AS b0,
       (SELECT CAST(ROUND(b1 * 1e9) AS BIGINT) / 1e9 FROM beta2) AS b1
FROM packed GROUP BY lang
"""


@register(
    "pipeline_classifier_curation_e2e",
    oracle=_curation_oracle(),
    tags=("text", "training", "ml", "iterative", "pipeline"),
)
def pipeline_classifier_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-in-the-loop corpus curation END TO END, one oracle:

    1. label carve-out (doc_id % {_CUR_LABEL_MOD} == 0): gold quality
       label = lexical diversity (distinct-token ratio >= {_CUR_DIVERSITY_T})
       — the expensive tokenize+distinct pass runs ONLY here;
    2. train logistic regression (intercept + cheap length feature) by
       two IRLS Newton steps — the ml_logreg_irls machinery: per step
       one map-side pass to five BIGINT fixed-point stats, a driver-side
       2x2 solve that mirrors the oracle CTE bit-for-bit
       (plans/mltrain.py _logreg_solve_py);
    3. apply the learned model as a MAP-ONLY corpus filter: the betas
       re-enter as double literals, keep docs whose fixed-point
       quantized linear score is >= 0 (p >= 1/2; quantization makes the
       cut engine-exact — measured scores sit >= 17k fixed-point units
       from the boundary at every sf);
    4. temperature mixture (T=2) per language over survivors:
       rate = sqrt(n)/sqrt(max n), deterministic hash uniform;
    5. per-shard sequence packing into {_CTX}-token packs.

    Output: one audit row per language (docs/tokens/packs/offset+id
    checksums) carrying the trained betas (1e-9 quantized), so the
    oracle pins the model AND every downstream consequence of applying
    it.

    Scale: the gold label costs tokenize+distinct on |carve-out| docs
    only (~1/{_CUR_LABEL_MOD} of the corpus; in production, a fixed human-labeled
    set).  Training crosses the wire as 2x5 BIGINTs regardless of corpus
    size.  The filter is a literal comparison fused into the scan —
    the 100 TB side never shuffles until the {_NSHARDS}-shard packing
    exchange, and the mixture is one ~|langs|-row aggregate + broadcast
    join, exactly the pretrain flagship's sanctioned shapes."""
    from copperhead_spark.operators.rochester import hash_uniform_sql
    from copperhead_spark.plans.mltrain import _logreg_solve_py

    x_sql, y_sql = _cur_xy("spark")
    docs = table(spark, sf_dir, "documents")
    lab = docs.filter(F.expr(f"doc_id % {_CUR_LABEL_MOD} = 0")).selectExpr(
        f"{x_sql} AS x", f"{y_sql} AS y"
    )
    st0 = lab.selectExpr(
        "COUNT(*) * 250000 AS s0",
        "SUM(CAST(ROUND(0.25e0 * x * 1e6) AS BIGINT)) AS s1",
        "SUM(CAST(ROUND(0.25e0 * x * x * 1e6) AS BIGINT)) AS s2",
        "SUM(CAST(ROUND((y - 0.5e0) * 1e6) AS BIGINT)) AS g0",
        "SUM(CAST(ROUND((y - 0.5e0) * x * 1e6) AS BIGINT)) AS g1",
    ).first()
    b0, b1 = _logreg_solve_py(0.0, 0.0, st0.s0, st0.s1, st0.s2, st0.g0, st0.g1)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b0) + F.lit(b1) * F.col("x"))))
    w = p * (F.lit(1.0) - p)
    st1 = lab.agg(
        F.sum(F.round(w * 1e6).cast("long")).alias("s0"),
        F.sum(F.round(w * F.col("x") * 1e6).cast("long")).alias("s1"),
        F.sum(F.round(w * F.col("x") * F.col("x") * 1e6).cast("long")).alias("s2"),
        F.sum(F.round((F.col("y") - p) * 1e6).cast("long")).alias("g0"),
        F.sum(F.round((F.col("y") - p) * F.col("x") * 1e6).cast("long")).alias("g1"),
    ).first()
    b0, b1 = _logreg_solve_py(b0, b1, st1.s0, st1.s1, st1.s2, st1.g0, st1.g1)

    corpus = docs.filter(F.expr(f"doc_id % {_CUR_LABEL_MOD} <> 0")).selectExpr(
        "doc_id",
        "lang",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
        f"{x_sql} AS x",
    )
    score_q = F.round((F.lit(b0) + F.lit(b1) * F.col("x")) * 1e6).cast("long")
    kept = corpus.filter(score_q >= 0).drop("x")

    m = kept.groupBy("lang").agg(F.count("*").alias("n"))
    # scalar-subquery pattern (pretrain flagship precedent): the global
    # max is one literal, never a constant-key join; NULL -> 0 keeps the
    # all-filtered corner an empty frame instead of int(None).
    max_n = int(m.agg(F.max("n")).first()[0] or 0)
    rates = m.selectExpr(
        "lang",
        f"SQRT(CAST(n AS DOUBLE)) / SQRT(CAST({max_n} AS DOUBLE)) AS rate",
    )
    u = hash_uniform_sql("doc_id", _CUR_MIX_SALT)
    s5 = (
        kept.join(F.broadcast(rates), "lang")
        .filter(F.expr(f"{u} < rate"))
        .withColumn("shard", F.col("doc_id") % _NSHARDS)
    )
    win = Window.partitionBy("shard").orderBy("doc_id")
    packed = s5.withColumn(
        "off", F.sum("n_tokens").over(win) - F.col("n_tokens")
    )
    b0_q = "CAST(ROUND(CAST({!r} AS DOUBLE) * 1e9) AS BIGINT) / 1e9".format(b0)
    b1_q = "CAST(ROUND(CAST({!r} AS DOUBLE) * 1e9) AS BIGINT) / 1e9".format(b1)
    return (
        packed.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.countDistinct(
                F.col("shard") * _PACK_STRIDE + F.expr(f"off div {_CTX}")
            ).cast("long").alias("n_packs"),
            F.sum(F.col("off") % _CTX).cast("long").alias("offset_checksum"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .selectExpr("*", f"{b0_q} AS b0", f"{b1_q} AS b1")
    )


from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
