"""Deduplication operator family (mandated beyond-reference capability:
exact, MinHash+LSH, SimHash, n-gram Jaccard — the LLM-training-data
pipeline operators; no copperhead counterpart, SURVEY.md §7 step 8).

All hashing is engine-portable integer arithmetic (functions/text.py), so
every query here has a full-value DuckDB oracle — including MinHash
signatures and LSH candidate pairs, which usually get waved off as
"approximate, can't check": the approximation is deterministic given the
hash family, so it IS checkable.

Scale design (100 TB corpus):
- signatures/fingerprints are per-row HOF expressions — no shuffle, no UDF.
- LSH banding turns the O(n^2) pair space into groupBy(band_key) — the
  shuffle is on candidate buckets only.
- the exact Jaccard verify join is restricted to LSH candidates in the
  scale path; here it also runs standalone as its own oracle-checked
  operator on the (small) documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.operators.barrier import project_once
from copperhead_spark.functions.text import (
    minhash_duck,
    minhash_signature_spark,
    rolling_fingerprint_duck,
    rolling_fingerprint_spark,
    shingle_hashes_duck,
    shingle_hashes_spark,
    simhash_duck,
    simhash_from_votes,
    simhash_votes_spark,
    token_hashes_duck,
    token_hashes_spark,
    token_ngram_hashes_duck,
    token_ngram_hashes_spark,
)
from copperhead_spark.plans.registry import register

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    oracle="""
SELECT doc_id,
       md5(lower(text)) AS fingerprint,
       CAST(COUNT(*) OVER (PARTITION BY md5(lower(text))) AS BIGINT) AS dup_count,
       MIN(doc_id) OVER (PARTITION BY md5(lower(text))) AS canonical_doc_id
FROM documents
""",
    tags=("dedup",),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (hash-groupBy) dedup: content fingerprint, group size, and
    canonical representative (min doc_id) per group.  md5 produces
    identical hex in both engines.  At scale: groupBy(fingerprint) with
    map-side partial agg; the window form here keeps per-doc rows."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.col("text")))
    w = Window.partitionBy(fp)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count("*").over(w).alias("dup_count"),
        F.min("doc_id").over(w).alias("canonical_doc_id"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup)
# ---------------------------------------------------------------------------

_JACCARD_T = 0.35
# exact all-pairs Jaccard is O(sum_s n_s^2) — on this shared-vocabulary
# corpus that explodes superlinearly with doc count, so the standalone
# exact operator is bounded to the first 1000 docs (covers all of
# sf0.01; at scale the exact verify runs only on LSH candidates)
_JACCARD_CAP = 1000

_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({shingle_hashes_duck()})) AS s
  FROM documents WHERE doc_id < {_JACCARD_CAP}
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2,
       CAST(c AS DOUBLE) / (z1.n + z2.n - c) AS jaccard
FROM common
JOIN sz z1 ON z1.doc_id = doc1
JOIN sz z2 ON z2.doc_id = doc2
WHERE CAST(c AS DOUBLE) / (z1.n + z2.n - c) >= {_JACCARD_T}
"""


@register("dedup_ngram_jaccard_pairs", oracle=_JACCARD_ORACLE, tags=("dedup",))
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard near-dup pairs (threshold 0.35): explode
    distinct shingle hashes, self-join on shingle, count common, divide
    by union size.  At 100 TB this runs only on LSH candidates; shown
    standalone so the exact operator itself is oracle-checked."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _JACCARD_CAP)
    sh = docs.selectExpr(
        "doc_id", f"explode(array_distinct({shingle_hashes_spark()})) AS s"
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("c"))
    )
    z1 = sz.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    z2 = sz.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    jac = F.col("c").cast("double") / (F.col("n1") + F.col("n2") - F.col("c"))
    return (
        common.join(z1, "doc1")
        .join(z2, "doc2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= _JACCARD_T)
        .select("doc1", "doc2", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

_K = 8  # minhashes
_BANDS = 4  # 4 bands x 2 rows

_MH_DUCK = [minhash_duck(k, shingle_hashes_duck()) for k in range(_K)]

_SIG_ORACLE = "SELECT doc_id, " + ", ".join(
    f"{m} AS mh{k}" for k, m in enumerate(_MH_DUCK)
) + " FROM documents"


@register("dedup_minhash_signatures", oracle=_SIG_ORACLE, tags=("dedup",))
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (K=8) per document: min over shingle hashes of
    K affine permutations mod 2^31-1.  Production path: vectorized Arrow
    UDF (operators/dedup.py) — identical integer arithmetic to the
    SQL-expression reference form, which the oracle runs on DuckDB, so
    the UDF is value-checked, not trusted.  project_once is a
    shuffle-free optimizer barrier: without it ProjectCollapse would
    duplicate the signature computation once per extracted column."""
    from copperhead_spark.operators.dedup import minhash_signature_udf

    docs = table(spark, sf_dir, "documents")
    sig = project_once(
        docs.select("doc_id", minhash_signature_udf()(F.col("text")).alias("sig")),
        "doc_id",
        "sig",
    )
    return sig.selectExpr(
        "doc_id", *[f"element_at(sig, {k + 1}) AS mh{k}" for k in range(_K)]
    )


@register("dedup_minhash_signatures_sql", oracle=_SIG_ORACLE, tags=("dedup",))
def dedup_minhash_signatures_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-expression MinHash (no UDF anywhere): one fold computes all K
    mins via an array accumulator (functions/text.py).  Slower than the
    Arrow kernel (HOF lambdas are interpreted) but UDF-free — kept as the
    portable reference implementation and registered so both paths face
    the same oracle."""
    docs = table(spark, sf_dir, "documents")
    sig = project_once(
        docs,
        "doc_id",
        f"{minhash_signature_spark(shingle_hashes_spark())} AS sig",
    )
    return sig.selectExpr(
        "doc_id", *[f"element_at(sig, {k + 1}) AS mh{k}" for k in range(_K)]
    )


_BAND_KEYS_DUCK = [
    f"CAST(mh{2 * b} AS VARCHAR) || '_' || CAST(mh{2 * b + 1} AS VARCHAR)"
    for b in range(_BANDS)
]

_LSH_ORACLE = f"""
WITH sig AS ({_SIG_ORACLE}),
bands AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, {key} AS band_key FROM sig"
    for b, key in enumerate(_BAND_KEYS_DUCK)
  )}
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(COUNT(*) AS BIGINT) AS n_shared_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@register("dedup_minhash_lsh_pairs", oracle=_LSH_ORACLE, tags=("dedup",))
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the MinHash signature (4 bands x 2 rows):
    documents sharing any band bucket become candidate pairs.  The
    banding shuffle is groupBy(band_key) — linear in corpus size; only
    bucket-mates join."""
    sig = dedup_minhash_signatures(spark, sf_dir)
    bands = None
    for b in range(_BANDS):
        part = sig.selectExpr(
            "doc_id",
            f"{b} AS band",
            f"CONCAT(CAST(mh{2 * b} AS STRING), '_', CAST(mh{2 * b + 1} AS STRING))"
            " AS band_key",
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    b_ = bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_NBITS = 16

_SIMHASH_ORACLE = f"""
SELECT doc_id, {simhash_duck(_NBITS, token_hashes_duck())} AS simhash
FROM documents
"""


@register("dedup_simhash_signatures", oracle=_SIMHASH_ORACLE, tags=("dedup",))
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over token hashes (majority vote per bit), computed
    as one vote-vector fold + barrier (same single-pass pattern as
    minhash)."""
    docs = table(spark, sf_dir, "documents")
    votes = project_once(
        docs,
        "doc_id",
        f"{simhash_votes_spark(_NBITS, token_hashes_spark())} AS votes",
    )
    return votes.selectExpr("doc_id", f"{simhash_from_votes(_NBITS)} AS simhash")


_SIMHASH_PAIRS_ORACLE = f"""
WITH sig AS ({_SIMHASH_ORACLE})
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
"""


# pigeonhole banding: splitting 16 bits into _N_BANDS=3 chunks means any
# pair at Hamming distance <= 2 has at least one identical chunk, so the
# banded equi-join is LOSSLESS for the <=2 threshold (no all-pairs scan)
_N_BANDS = 3
_BAND_BITS = ((0, 6), (6, 5), (11, 5))  # (shift, width) covering 16 bits


@register("dedup_simhash_pairs", oracle=_SIMHASH_PAIRS_ORACLE, tags=("dedup",))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance <= 2 on the 16-bit
    fingerprint via banded blocking — each signature is keyed by its
    3 bit-chunks, candidates come from a hash equi-join on
    (band_id, band_value), then the exact Hamming filter runs only on
    candidates.  Same rows as the all-pairs oracle (pigeonhole), but the
    plan is a shuffled hash join that scales linearly with band-bucket
    occupancy instead of a BroadcastNestedLoopJoin over all pairs."""
    sig = dedup_simhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright("simhash", sh)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("band_val"),
                    )
                    for i, (sh, w) in enumerate(_BAND_BITS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
        # a pair can collide in more than one band
        .dropDuplicates(["doc1", "doc2"])
    )


# ---------------------------------------------------------------------------
# connected components: candidate pairs -> duplicate clusters
# ---------------------------------------------------------------------------

# transitive closure over the LSH candidate graph; MIN reachable doc_id is
# the component label.  Closure is O(n*m) — fine for the oracle at sf0.01;
# the Spark side uses O(diameter)-round hash-min propagation instead.
_CC_ORACLE = f"""
WITH RECURSIVE pairs AS ({_LSH_ORACLE}),
edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION ALL
  SELECT doc2 AS a, doc1 AS b FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
)
SELECT node AS doc_id, MIN(r) AS component
FROM reach GROUP BY node
"""


@register("dedup_connected_components", oracle=_CC_ORACLE, tags=("dedup",))
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs -> duplicate clusters: every document labeled
    with the min doc_id reachable through the pair graph (iterative
    hash-min propagation, operators/graph.py).  The step that turns
    near-dup *pairs* into an actual keep/drop decision: keep doc iff
    doc_id == component."""
    from copperhead_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc1", "doc2")
    return connected_components(
        docs, pairs, node_col="doc_id", src_col="doc1", dst_col="doc2"
    )


@register(
    "dedup_cluster_stats",
    oracle=f"""
WITH cc AS ({_CC_ORACLE})
SELECT component AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM cc GROUP BY component
""",
    tags=("dedup",),
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster roll-up over the connected-components labeling: one row
    per duplicate cluster with its canonical representative (the min
    doc_id) and size — the dedup audit table (dedup rate = 1 -
    n_clusters / n_docs)."""
    cc = dedup_connected_components(spark, sf_dir)
    return cc.groupBy(F.col("component").alias("canonical_doc_id")).agg(
        F.count("*").alias("cluster_size")
    )


@register(
    "text_rolling_fingerprint",
    oracle=f"""
SELECT doc_id, {rolling_fingerprint_duck()} AS fingerprint
FROM documents
""",
    tags=("dedup", "text"),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling polynomial fingerprint of the whole
    document (mod 1e9+7) — the content-defined-chunking primitive."""
    docs = table(spark, sf_dir, "documents")
    return docs.selectExpr("doc_id", f"{rolling_fingerprint_spark()} AS fingerprint")


# ---------------------------------------------------------------------------
# duplicate-cluster representative selection: the final dedup OUTPUT.
# CC gives every doc a cluster label; the kept corpus is one doc per
# cluster.  Policy here: keep the longest doc (argmax n_chars, min
# doc_id tiebreak) — integer ordering, so the choice is exact and
# engine-portable.  One window over cluster-partitioned data: the
# shuffle key is the component label, cluster sizes are tiny (bounded
# by near-dup group size), so there is no skew pathology.
# ---------------------------------------------------------------------------


@register(
    "dedup_cluster_representatives",
    oracle=f"""
WITH cc AS ({_CC_ORACLE})
SELECT component, doc_id AS kept_doc_id, n_chars,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM (
  SELECT cc.component, cc.doc_id, d.n_chars,
         COUNT(*) OVER (PARTITION BY cc.component) AS cluster_size,
         ROW_NUMBER() OVER (
           PARTITION BY cc.component
           ORDER BY d.n_chars DESC, cc.doc_id ASC
         ) AS rn
  FROM cc JOIN documents d USING (doc_id)
)
WHERE rn = 1
""",
    tags=("dedup",),
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept corpus after near-dup clustering: one representative per
    connected component (longest doc wins, doc_id breaks ties), with the
    cluster size for audit.  Composes CC labeling with a per-cluster
    argmax window — the standard 'pick canonical page' policy in
    dedup pipelines."""
    cc = dedup_connected_components(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = cc.join(docs, "doc_id")
    w = Window.partitionBy("component")
    wr = w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        joined.withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc_id"),
            "n_chars",
            "cluster_size",
        )
    )


# ---------------------------------------------------------------------------
# minhash Jaccard ESTIMATION: the step between candidate generation and
# exact verification.  est = fraction of agreeing minhashes (unbiased
# estimator of Jaccard); at 100 TB the estimate ranks/filters the LSH
# candidates so only the top sliver pays the exact shingle-join
# verification.  Signature agreement is integer equality — exact on both
# engines, the estimate an 1/K-grained rational.
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_jaccard_est",
    oracle=f"""
WITH sig AS ({_SIG_ORACLE}),
pairs AS ({_LSH_ORACLE})
SELECT p.doc1, p.doc2,
       CAST({" + ".join(
           f"CASE WHEN s1.mh{k} = s2.mh{k} THEN 1 ELSE 0 END" for k in range(_K)
       )} AS DOUBLE) / {float(_K)!r} AS jaccard_est
FROM pairs p
JOIN sig s1 ON s1.doc_id = p.doc1
JOIN sig s2 ON s2.doc_id = p.doc2
""",
    tags=("dedup",),
)
def dedup_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair Jaccard estimate from signature agreement
    (matches/K): ranks LSH candidates so exact verification runs only on
    the promising sliver.  Signatures join back by doc_id — two hash
    joins against the (doc_id-keyed) signature table, the same access
    pattern a signature store would serve at scale."""
    sig = dedup_minhash_signatures(spark, sf_dir)
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc1", "doc2")
    s1 = sig.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(f"mh{k}").alias(f"a{k}") for k in range(_K)],
    )
    s2 = sig.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(f"mh{k}").alias(f"b{k}") for k in range(_K)],
    )
    agree = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0) for k in range(_K)
    )
    return (
        pairs.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            (agree.cast("double") / F.lit(float(_K))).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# substring-level dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): doc-level exact/near dedup misses the
# long verbatim PASSAGES shared by otherwise-distinct documents.  The
# suffix-array formulation of the paper is replaced by its
# shuffle-friendly equivalent: every OVERLAPPING token n-gram window is
# rolling-hashed; a window whose hash occurs in >= 2 distinct documents
# marks a duplicated span; per-document "duplicated token coverage" is
# the size of the UNION of those overlapping windows, computed exactly
# by one fold over the sorted duplicate positions (no per-token rows).
#
# Scale (100 TB): gram hashing is a per-row array expression fused into
# the scan; the duplicate-gram table is one partial-agg groupBy on
# gram_hash (distinct-gram cardinality crosses the wire, not token
# count); the marking join reuses the same gram_hash key so AQE chains
# the two exchanges without re-partitioning; the doc rollup is the only
# doc-keyed exchange and carries (pos, is_dup) pairs, tens of bytes/row.
# This matches the shuffle volume of the segment (line) dedup pass while
# detecting spans at every offset, not just aligned segment boundaries.
# ---------------------------------------------------------------------------

_SSD_N = 8  # window length in tokens, the Lee et al. working unit scaled down
_SSD_MIN_DOCS = 2  # a gram in >= 2 distinct docs is a duplicated span


def _ssd_cov_spark(ps: str) -> str:
    """Exact union length of overlapping {_SSD_N}-token windows at sorted
    1-based positions ``ps``: fold carrying (covered, exclusive_end)."""
    z = "CAST(0 AS BIGINT)"
    return (
        f"aggregate({ps}, named_struct('cov', {z}, 'e', {z}),"
        f" (acc, p) -> named_struct("
        f"'cov', acc.cov + greatest({z}, p + {_SSD_N} - greatest(acc.e, p)),"
        f" 'e', greatest(acc.e, p + {_SSD_N})),"
        f" acc -> acc.cov)"
    )


def _ssd_cov_duck(ps: str) -> str:
    """DuckDB twin: list_reduce needs accumulator type == element type,
    so the (covered, end) pair rides as a 2-element BIGINT list."""
    z = "CAST(0 AS BIGINT)"
    return (
        f"list_reduce(list_prepend([{z}, {z}],"
        f" list_transform({ps}, p -> [CAST(p AS BIGINT), CAST(p AS BIGINT)])),"
        f" (acc, x) -> [acc[1] + greatest({z}, x[1] + {_SSD_N} - greatest(acc[2], x[1])),"
        f" greatest(acc[2], x[1] + {_SSD_N})])[1]"
    )


def _ssd_oracle() -> str:
    grams = token_ngram_hashes_duck(_SSD_N, "th")
    ps = "COALESCE(ps, CAST([] AS BIGINT[]))"
    return f"""
WITH th AS (
  SELECT doc_id, {token_hashes_duck("text")} AS th FROM documents
),
g AS (
  SELECT doc_id, {grams} AS gh FROM th
),
grams AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos, gh[t.i] AS gram_hash
  FROM g CROSS JOIN LATERAL (
    SELECT unnest(range(1, len(gh) + 1)) AS i
  ) t
),
dup AS (
  -- cross-doc test as MIN/MAX doc_id inequality: one single-phase agg,
  -- no COUNT DISTINCT expansion (equivalent for the >= 2 distinct test)
  SELECT gram_hash
  FROM (SELECT gram_hash, MIN(doc_id) AS d0, MAX(doc_id) AS d1 FROM grams GROUP BY 1)
  WHERE d0 <> d1
),
marked AS (
  SELECT g.doc_id, g.pos,
         CASE WHEN d.gram_hash IS NULL THEN 0 ELSE 1 END AS is_dup
  FROM grams g LEFT JOIN dup d USING (gram_hash)
),
per AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(is_dup) AS BIGINT) AS n_dup_grams,
         list_sort(list(pos) FILTER (WHERE is_dup = 1)) AS ps
  FROM marked GROUP BY doc_id
)
SELECT doc_id, n_grams, n_dup_grams, {_ssd_cov_duck(ps)} AS dup_token_cov
FROM per
"""


@register("text_substring_dedup", oracle=_ssd_oracle(), tags=("text", "dedup"))
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicated-span coverage: per document, the number
    of overlapping {_SSD_N}-token windows whose rolling hash appears in
    >= {_SSD_MIN_DOCS} distinct documents, and the exact count of tokens
    covered by the union of those windows (the span a substring-dedup
    trim pass would cut).  Documents shorter than {_SSD_N} tokens have no
    windows and drop out (both engines agree).  See the family note
    above for the 100 TB shuffle shape."""
    docs = table(spark, sf_dir, "documents")
    th = project_once(docs, "doc_id", f"{token_hashes_spark('text')} AS _th")
    # materialize the gram stream once: both the duplicate-gram agg and
    # the marking join consume it, and without truncation each side
    # re-runs the per-char token-hash fold over the whole corpus
    grams = th.selectExpr(
        "doc_id",
        f"posexplode({token_ngram_hashes_spark(_SSD_N, '_th')}) AS (pos0, gram_hash)",
    ).selectExpr(
        "doc_id", "CAST(pos0 + 1 AS BIGINT) AS pos", "gram_hash"
    ).localCheckpoint()
    dup = (
        grams.groupBy("gram_hash")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("gram_hash", F.lit(1).alias("is_dup"))
    )
    marked = grams.join(dup, "gram_hash", "left")
    per = marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dup_grams"),
        F.sort_array(
            F.collect_list(F.when(F.col("is_dup") == 1, F.col("pos")))
        ).alias("ps"),
    )
    return per.selectExpr(
        "doc_id", "n_grams", "n_dup_grams", f"{_ssd_cov_spark('ps')} AS dup_token_cov"
    )


# ---------------------------------------------------------------------------
# n-gram containment (asymmetric near-dup: doc-in-doc)
# ---------------------------------------------------------------------------

# Jaccard misses subset duplication: a short doc fully embedded in a long
# one has |A∩B|/|A∪B| ≈ |A|/|B| → 0, but containment |A∩B|/min(|A|,|B|)
# = 1.  Threshold high enough that pairs here are genuine engulfment,
# not the symmetric near-dups dedup_ngram_jaccard_pairs already finds.
_CONT_T = 0.6

_CONTAIN_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({shingle_hashes_duck()})) AS s
  FROM documents WHERE doc_id < {_JACCARD_CAP}
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2,
       CAST(c AS DOUBLE) / LEAST(z1.n, z2.n) AS containment,
       CAST(CASE WHEN z1.n <= z2.n THEN doc1 ELSE doc2 END AS BIGINT) AS contained_doc
FROM common
JOIN sz z1 ON z1.doc_id = doc1
JOIN sz z2 ON z2.doc_id = doc2
WHERE CAST(c AS DOUBLE) / LEAST(z1.n, z2.n) >= {_CONT_T}
"""


@register("dedup_ngram_containment_pairs", oracle=_CONTAIN_ORACLE, tags=("dedup",))
def dedup_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup via shingle containment |A∩B|/min(|A|,|B|)
    >= {_CONT_T}: catches a document engulfed by a longer one (quote
    farms, boilerplate wrappers), which Jaccard's union denominator
    dilutes below any usable threshold.  Also labels WHICH side is the
    contained (smaller) document — the one a curation pass would drop.
    Same bounded exact-pair shape as dedup_ngram_jaccard_pairs; at
    100 TB the pair stream comes from LSH candidates
    (dedup_minhash_lsh_pairs) and this exact measure is the refine
    step.  Reference analogue: none (beyond-reference curation op)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _JACCARD_CAP)
    sh = docs.selectExpr(
        "doc_id", f"explode(array_distinct({shingle_hashes_spark()})) AS s"
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("c"))
    )
    z1 = sz.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    z2 = sz.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    cont = F.col("c").cast("double") / F.least(F.col("n1"), F.col("n2"))
    return (
        common.join(z1, "doc1")
        .join(z2, "doc2")
        .withColumn("containment", cont)
        .filter(F.col("containment") >= _CONT_T)
        .select(
            "doc1",
            "doc2",
            "containment",
            F.when(F.col("n1") <= F.col("n2"), F.col("doc1"))
            .otherwise(F.col("doc2"))
            .cast("long")
            .alias("contained_doc"),
        )
    )


# ---------------------------------------------------------------------------
# LSH candidate-quality gate (recall vs exact Jaccard ground truth)
# ---------------------------------------------------------------------------

_LSH_RECALL_ORACLE = f"""
WITH truth AS ({_JACCARD_ORACLE}),
cand AS (SELECT doc1, doc2 FROM ({_LSH_ORACLE})
         WHERE doc1 < {_JACCARD_CAP} AND doc2 < {_JACCARD_CAP}),
j AS (
  SELECT COALESCE(t.doc1, c.doc1) AS doc1,
         (t.doc1 IS NOT NULL) AS is_truth, (c.doc1 IS NOT NULL) AS is_cand
  FROM truth t FULL OUTER JOIN cand c
    ON t.doc1 = c.doc1 AND t.doc2 = c.doc2
)
SELECT CAST(SUM(CASE WHEN is_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
       CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
       CAST(SUM(CASE WHEN is_truth AND is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CAST(SUM(CASE WHEN is_truth AND is_cand THEN 1 ELSE 0 END) AS DOUBLE)
         / SUM(CASE WHEN is_truth THEN 1 ELSE 0 END) AS recall,
       CAST(SUM(CASE WHEN is_truth AND is_cand THEN 1 ELSE 0 END) AS DOUBLE)
         / SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS precision
FROM j
"""


@register("dedup_lsh_recall", oracle=_LSH_RECALL_ORACLE, tags=("dedup", "eval"))
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality gate for the LSH pipeline: recall AND precision of the banded
    MinHash candidates against exact {_JACCARD_T}-Jaccard ground truth on
    the capped corpus — the dedup twin of sim_ivf_recall (the judge-able
    number behind 'banding is lossy but good enough').  Exact integer
    hit counts, one float division at the end, so the quality claim
    itself is oracle-checked; a banding/shingle regression that silently
    dropped candidates would hash-fail this row.  Scale: both inputs are
    the already-bounded pair streams; the probe join is tiny."""
    truth = dedup_ngram_jaccard_pairs(spark, sf_dir).select("doc1", "doc2")
    cand = (
        dedup_minhash_lsh_pairs(spark, sf_dir)
        .filter((F.col("doc1") < _JACCARD_CAP) & (F.col("doc2") < _JACCARD_CAP))
        .select(F.col("doc1").alias("c1"), F.col("doc2").alias("c2"))
    )
    j = truth.join(
        cand, (truth.doc1 == cand.c1) & (truth.doc2 == cand.c2), "full_outer"
    ).select(
        truth.doc1.isNotNull().cast("long").alias("is_truth"),
        F.col("c1").isNotNull().cast("long").alias("is_cand"),
    )
    hit = (F.col("is_truth") * F.col("is_cand"))
    return j.agg(
        F.sum("is_truth").alias("n_truth"),
        F.sum("is_cand").alias("n_cand"),
        F.sum(hit).alias("n_hit"),
        (F.sum(hit).cast("double") / F.sum("is_truth")).alias("recall"),
        (F.sum(hit).cast("double") / F.sum("is_cand")).alias("precision"),
    )


# ---------------------------------------------------------------------------
# fuzzy dedup END-TO-END: the whole near-dup pipeline (minhash ->
# banded LSH -> connected components -> representative selection ->
# kept-corpus accounting) as ONE plan with ONE full-value oracle.
# Each stage is individually oracle-checked above; this query pins the
# COMPOSITION — the actual deliverable of a dedup pass: per-domain
# before/after corpus statistics.
# ---------------------------------------------------------------------------


@register(
    "pipeline_fuzzy_dedup_e2e",
    oracle=f"""
WITH RECURSIVE pairs AS ({_LSH_ORACLE}),
edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION ALL
  SELECT doc2 AS a, doc1 AS b FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
cc AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
j AS (
  SELECT cc.component, cc.doc_id, d.lang, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY cc.component
           ORDER BY d.n_chars DESC, cc.doc_id ASC
         ) AS rn
  FROM cc JOIN documents d USING (doc_id)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM j
GROUP BY lang
""",
    tags=("dedup", "pipeline"),
)
def pipeline_fuzzy_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate removal END-TO-END: minhash signatures -> banded
    LSH candidate pairs -> hash-min connected components -> longest-doc
    representative per cluster -> per-language kept-corpus accounting
    (docs in/kept/removed, surviving characters).  One plan, one oracle:
    a regression anywhere in the four-stage compose (banding recall,
    propagation, tie-breaks, attribution) shifts an integer in this
    table.

    Scale: the only stages that touch pair space are banded (bucket-mate
    joins only); CC is O(diameter) checkpointed rounds over the pair
    list — tiny next to the corpus; the representative window partitions
    by component (bounded cluster sizes); the final rollup is one
    partial-agg exchange over (lang).  This is the exact operator chain
    a 100 TB curation run executes between 'raw crawl' and 'training
    mix', with the audit numbers it must publish."""
    cc = dedup_connected_components(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    joined = cc.join(docs, "doc_id")
    wr = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    flagged = joined.withColumn("rn", F.row_number().over(wr))
    return flagged.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
        F.sum((F.col("rn") != 1).cast("long")).alias("n_removed"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# winnowing (MOSS-style selected fingerprints)
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # gram-hashes per winnow window
_WINNOW_CAP = 500  # bound the exploded per-fingerprint output
_WINNOW_PAIR_CAP = 1000
_WINNOW_MIN_SHARED = 50

_WINNOW_SEL_DUCK = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len(g) - {_WINNOW_W - 1}, 1) + 1),"
    f" i -> list_min(g[i:i+{_WINNOW_W - 1}])))"
)
_WINNOW_SEL_SPARK = (
    f"array_distinct(transform("
    f"sequence(1, greatest(size(g) - {_WINNOW_W - 1}, 1)),"
    f" i -> array_min(slice(g, i, {_WINNOW_W}))))"
)


def _winnow_grams_spark(docs: DataFrame, cap: int) -> DataFrame:
    return docs.filter(
        (F.col("doc_id") < cap) & (F.length("text") >= 5)
    ).selectExpr("doc_id", f"{shingle_hashes_spark()} AS g")


def _winnow_grams_duck(cap: int) -> str:
    return (
        f"SELECT doc_id, {shingle_hashes_duck()} AS g FROM documents"
        f" WHERE doc_id < {cap} AND length(text) >= 5"
    )


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
WITH grams AS ({_winnow_grams_duck(_WINNOW_CAP)})
SELECT doc_id, unnest({_WINNOW_SEL_DUCK}) AS fingerprint
FROM grams WHERE len(g) > 0
""",
    tags=("dedup", "winnowing"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    local-document-fingerprint scheme): hash every 5-char shingle, slide
    a {_WINNOW_W}-gram window, keep each window's minimum hash
    (leftmost-min variant — deterministic on both engines).  Guarantees
    any shared substring of length >= {_WINNOW_W} + 4 yields a shared
    fingerprint, while storing ~2/(w+1) of the gram stream.  Pure
    per-row array expressions — zero shuffle, linear in corpus size; the
    selected-fingerprint stream is what a 100 TB plagiarism/near-dup
    index actually materializes."""
    docs = table(spark, sf_dir, "documents")
    return (
        _winnow_grams_spark(docs, _WINNOW_CAP)
        .filter(F.size("g") > 0)
        .selectExpr("doc_id", f"explode({_WINNOW_SEL_SPARK}) AS fingerprint")
    )


@register(
    "dedup_winnowing_pairs",
    oracle=f"""
WITH grams AS ({_winnow_grams_duck(_WINNOW_PAIR_CAP)}),
fp AS (
  SELECT doc_id, unnest({_WINNOW_SEL_DUCK}) AS fingerprint
  FROM grams WHERE len(g) > 0
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
""",
    tags=("dedup", "winnowing"),
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= {_WINNOW_MIN_SHARED} winnowed
    fingerprints — the MOSS match step.  The pair space is the
    fingerprint-bucket join (only docs sharing a selected fingerprint
    meet), the same banded-blocking shape as LSH: pair cost tracks true
    overlap density, never corpus^2.  Fingerprints are already distinct
    per doc, so the shared count is exact substring-overlap evidence."""
    docs = table(spark, sf_dir, "documents")
    fp = (
        _winnow_grams_spark(docs, _WINNOW_PAIR_CAP)
        .filter(F.size("g") > 0)
        .selectExpr("doc_id", f"explode({_WINNOW_SEL_SPARK}) AS fingerprint")
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# set-similarity join with prefix filtering (PPJoin-style, exact)
# ---------------------------------------------------------------------------

_PF_MOD = 10  # corpus slice: every 10th document
_PF_T_E6 = 600_000  # Jaccard threshold 0.6


_PF_ORACLE = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id % {_PF_MOD} = 0
),
p AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
         CAST(len(a.toks) + len(b.toks)
              - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT doc1, doc2, inter,
       CAST((inter * 1000000) // uni AS BIGINT) AS jaccard_e6
FROM p WHERE inter * 1000000 >= {_PF_T_E6} * uni
ORDER BY doc1, doc2
"""


@register("dedup_prefix_filter_pairs", oracle=_PF_ORACLE, tags=("dedup", "similarity"))
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join (Jaccard >= 0.6 on distinct-token sets)
    via PREFIX FILTERING, the PPJoin family's core idea: order every
    document's tokens globally by ascending document frequency
    (rarest first, doc_id-free tie-break on the token itself) and index
    only each document's first |d| - ceil(t*|d|) + 1 tokens — any pair
    above the threshold MUST collide on at least one prefix token, so
    the candidate set is complete, and the exact Jaccard verify then
    makes it sound.  The oracle is the brute-force all-pairs join, so
    the driver row proves the filter loses nothing.

    Scale design: unlike MinHash banding (probabilistic recall), prefix
    filtering is exact AND bounded: candidate volume is the sum over
    PREFIX tokens of block^2, and because prefixes hold the rarest
    tokens those blocks are the smallest in the corpus — the standard
    exact complement to dedup_minhash_lsh_pairs.  Everything is
    equi-joins and partial aggs: df counts (one shuffle), per-doc rank
    windows, prefix-token self-join, and a verify join that touches only
    candidate pairs.

    Complements dedup_ngram_jaccard_pairs (fixed blocking key) with a
    threshold-adaptive filter."""
    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _PF_MOD == 0
    )
    toks = docs.selectExpr(
        "doc_id", "explode(array_distinct(split(text, ' '))) AS tok"
    ).localCheckpoint()  # reused by df counts, prefix index, and verify
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("df"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    ranked = (
        toks.join(F.broadcast(df_counts), "tok")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("tok").asc()
                )
            ),
        )
        .join(F.broadcast(sizes), "doc_id")
        # prefix length for Jaccard t: |d| - ceil(t|d|) + 1
        .filter(
            F.col("rn")
            <= F.col("sz") - F.expr(f"CAST(ceil(sz * {_PF_T_E6} / 1e6) AS BIGINT)") + 1
        )
        .select("doc_id", "tok", "rn", "sz")
    )
    # r12: PPJoin POSITIONAL filter on each prefix collision before the
    # distinct + verify.  A collision of d1's token at rank i with d2's
    # token at rank j (both ranks in the SAME global df-asc order) bounds
    # the overlap: inter <= 1 + min(sz1-i, sz2-j); Jaccard >= t needs
    # inter >= t*(sz1+sz2)/(1+t).  Soundness: a qualifying pair's FIRST
    # common token is inside both prefixes (else its suffix-only common
    # tokens number < ceil(t*sz) <= the required overlap) and at that
    # collision the bound holds, so the pair always survives; collisions
    # it prunes can never reach the final threshold, so the verified
    # output is row-identical (proved vs the brute-force oracle).  This
    # shrinks the candidate set BEFORE the two token-stream verify
    # joins — the dominant cost at 10x scale.
    cand = (
        ranked.alias("a")
        .join(ranked.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            (1 + F.least(F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")))
            * (1_000_000 + _PF_T_E6)
            >= _PF_T_E6 * (F.col("a.sz") + F.col("b.sz"))
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .distinct()
    )
    inter = (
        cand.join(toks.selectExpr("doc_id AS doc1", "tok"), "doc1")
        .join(toks.selectExpr("doc_id AS doc2", "tok"), ["doc2", "tok"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(F.broadcast(sizes.selectExpr("doc_id AS doc1", "sz AS sz1")), "doc1")
        .join(F.broadcast(sizes.selectExpr("doc_id AS doc2", "sz AS sz2")), "doc2")
        .selectExpr(
            "doc1",
            "doc2",
            "inter",
            "CAST(sz1 + sz2 - inter AS BIGINT) AS uni",
        )
        .filter(F.expr(f"inter * 1000000 >= {_PF_T_E6} * uni"))
    )
    return out.selectExpr(
        "doc1", "doc2", "inter",
        "CAST((inter * 1000000) DIV uni AS BIGINT) AS jaccard_e6",
    ).orderBy("doc1", "doc2")

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
