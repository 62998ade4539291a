"""Mergeable-sketch operators: HyperLogLog distinct counting as a plain
DataFrame aggregation.

Why this exists: COUNT(DISTINCT key) at 100 TB shuffles every distinct
key.  The HLL sketch shuffles (group, bucket) cells instead — at p=12
that is at most 4096 rows per group regardless of input size, with
map-side partial MAX combine.  Spark's built-in approx_count_distinct
does this too but its result is seed/implementation-specific; this
operator uses the repo's portable integer hash family, so the *entire
sketch* — bucket assignment, rank, harmonic estimate, linear-counting
correction — is reproduced bit-for-bit by the DuckDB oracle.  The repo's
standing claim, applied to sketches: a deterministic approximation is
full-value checkable, not "approximately tested".

The estimate itself is deterministic arithmetic: 2^-rank values and
their sums are exact dyadic rationals well inside double precision
(rank <= 32, <= 4096 terms => 46 significant bits), so summation order
cannot change the result; the only transcendental (LN in the
linear-counting branch) is routed through fixed-point rounding
(functions/exact.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.hashing import mix_py, mix_sql
from copperhead_spark.plans.registry import register

_HLL_P = 12
_HLL_M = 1 << _HLL_P  # 4096 buckets
# alpha_m for m >= 128 (Flajolet et al. 2007)
_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def _h(key: str, salt: int) -> str:
    """31-bit portable quadratic-mixed hash (functions/hashing.py) —
    identical text on both engines; the mixing rationale and the
    measured 16.6%->0.3% HLL-error history live with the helper."""
    return mix_sql(key, salt)


def _bucket_sql(key: str) -> str:
    return f"({_h(key, 17)} % {_HLL_M})"


def _rank_sql(key: str) -> str:
    """rho = leading-zero count of the 31-bit witness hash + 1, as a
    generated CASE ladder (exact integer comparisons — no log2 ulp
    games)."""
    w = _h(key, 19)
    branches = "\n".join(
        f"WHEN {w} >= {1 << (30 - i)} THEN {i + 1}" for i in range(31)
    )
    return f"(CASE {branches} ELSE 32 END)"


def _estimate_sql() -> str:
    """HLL estimate from (v_present, z) where z = sum of 2^-max_rank over
    present buckets; empty buckets contribute 2^0 = 1 each.  Linear
    counting below 2.5m when empty buckets exist, else the raw harmonic
    estimate; both branches rounded at 1e-4 so libm LN wobble cannot
    surface."""
    # every float literal is wrapped CAST(... AS DOUBLE): DuckDB parses
    # bare numeric literals as DECIMAL and overflows on the multiply
    v_empty = f"({_HLL_M} - v_present)"
    alpha = f"CAST({_ALPHA!r} AS DOUBLE)"
    m2 = f"CAST({float(_HLL_M * _HLL_M)!r} AS DOUBLE)"
    m1 = f"CAST({float(_HLL_M)!r} AS DOUBLE)"
    raw = f"({alpha} * {m2} / (CAST({v_empty} AS DOUBLE) + z))"
    linear = f"({m1} * LN({m1} / CAST({v_empty} AS DOUBLE)))"
    return (
        f"CAST(ROUND((CASE WHEN {raw} <= CAST({2.5 * _HLL_M!r} AS DOUBLE)"
        f" AND {v_empty} > 0"
        f" THEN {linear} ELSE {raw} END) * 1e4) AS BIGINT) / 1e4"
    )


_HLL_ORACLE = f"""
WITH cells AS (
  SELECT l_returnflag AS grp,
         {_bucket_sql("l_orderkey")} AS bucket,
         MAX({_rank_sql("l_orderkey")}) AS r
  FROM lineitem
  GROUP BY 1, 2
),
sk AS (
  -- 2^-r via exact integer shift + division (libm POWER is not
  -- guaranteed correctly rounded; 1/(1<<r) is)
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS v_present,
         SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) AS z
  FROM cells GROUP BY grp
)
SELECT grp, v_present, {_estimate_sql()} AS n_distinct_est
FROM sk
"""


@register("sketch_hll_distinct", oracle=_HLL_ORACLE, tags=("sketch", "A1"))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HyperLogLog distinct-order estimate (p={_HLL_P},
    m={_HLL_M}): shuffle cardinality is |groups| x m cells, never the
    key space; partial MAX combines map-side.  Sketches merge by MAX on
    bucket — the same plan shape incrementally absorbs new partitions
    (the mergeable-sketch contract)."""
    li = table(spark, sf_dir, "lineitem")
    cells = (
        li.selectExpr(
            "l_returnflag AS grp",
            f"{_bucket_sql('l_orderkey')} AS bucket",
            f"{_rank_sql('l_orderkey')} AS rank",
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    sk = cells.groupBy("grp").agg(
        F.count("*").cast("long").alias("v_present"),
        F.sum(
            F.expr("CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE)")
        ).alias("z"),
    )
    return sk.selectExpr("grp", "v_present", f"{_estimate_sql()} AS n_distinct_est")


# ---------------------------------------------------------------------------
# count-min sketch: point-query frequency estimation over the token
# stream.  Build cost is one aggregate with AT MOST depth x width cells
# (map-side combine bounds the shuffle the same way the HLL cells do);
# queries are O(depth) lookups.  CMS never undercounts (collisions only
# add), and with the deterministic hash family the whole sketch — cells
# and estimates — is reproduced exactly by the oracle.
# ---------------------------------------------------------------------------

_CMS_W = 1024
_CMS_SALTS = (37, 41, 43)
_CMS_TERMS = ("spark", "window", "merge", "the")
_TOKEN_P = 1_000_003


def _token_hash_py(w: str) -> int:
    """Driver-side twin of functions/text.py token_hashes_*."""
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % _TOKEN_P
    return h


_mix_py = mix_py
_mix_sql_text = mix_sql


def _cms_candidates() -> list[tuple[str, int, int]]:
    out = []
    for term in _CMS_TERMS:
        th = _token_hash_py(term)
        for salt in _CMS_SALTS:
            out.append((term, salt, _mix_py(th, salt) % _CMS_W))
    return out


def _cms_oracle() -> str:
    from copperhead_spark.functions.text import token_hashes_duck

    cand_rows = ", ".join(
        f"('{t}', {s}, {b})" for t, s, b in _cms_candidates()
    )
    arms = " UNION ALL ".join(
        f"SELECT {salt} AS salt, ({_mix_sql_text('th', salt)} % {_CMS_W}) AS bucket"
        " FROM toks"
        for salt in _CMS_SALTS
    )
    return f"""
WITH toks AS (
  SELECT unnest({token_hashes_duck("text")}) AS th FROM documents
),
cells AS (
  SELECT salt, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({arms})
  GROUP BY salt, bucket
),
cand(term, salt, bucket) AS (VALUES {cand_rows})
SELECT term, MIN(COALESCE(c, 0)) AS est_count
FROM cand LEFT JOIN cells USING (salt, bucket)
GROUP BY term
"""


def cms_cells_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-form CMS cell builder (the SQL twin of the vectorized
    kernel): explode the token-hash HOF, stack per salt, count.  Kept as
    the semantics reference — the production builder below computes the
    same integers ~3x faster (HOF lambdas are interpreted per char)."""
    from copperhead_spark.functions.text import token_hashes_spark

    docs = table(spark, sf_dir, "documents")
    toks = docs.selectExpr(f"explode({token_hashes_spark('text')}) AS th")
    return (
        toks.selectExpr(
            "stack(3, "
            + ", ".join(
                f"{salt}, ({_mix_sql_text('th', salt)} % {_CMS_W})"
                for salt in _CMS_SALTS
            )
            + ") AS (salt, bucket)"
        )
        .groupBy("salt", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


@register("sketch_cms_counts", oracle=_cms_oracle(), tags=("sketch", "A13"))
def sketch_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point queries for a fixed term set over the corpus
    token stream: depth {len(_CMS_SALTS)} x width {_CMS_W} cells built by
    a vectorized mapInPandas bincount kernel (at most depth x width
    partial rows per Arrow batch; operators/sketch_kernels.py), merged by
    one vocabulary-sized SUM; estimates are MIN over the term's cells.
    Never undercounts; overcount bounded by collisions (~n_tokens/width
    per cell)."""
    from copperhead_spark.operators.sketch_kernels import cms_cells

    docs = table(spark, sf_dir, "documents")
    cells = cms_cells(docs, "text", _CMS_SALTS, _CMS_W)
    cand = spark.createDataFrame(
        _cms_candidates(), schema="term string, salt int, bucket int"
    ).selectExpr("term", "CAST(salt AS BIGINT) AS salt", "CAST(bucket AS BIGINT) AS bucket")
    cells = cells.selectExpr(
        "CAST(salt AS BIGINT) AS salt", "CAST(bucket AS BIGINT) AS bucket", "c"
    )
    # broadcast the CELLS (right side of the left join — broadcasting the
    # left/preserved side of an outer join is unsupported and silently
    # degrades to a shuffle join); the cell table is at most depth x width
    # rows by construction, safely broadcastable at any corpus size
    est = (
        cand.join(F.broadcast(cells), ["salt", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
    return est


# ---------------------------------------------------------------------------
# binned quantile sketch: the mergeable scale path behind A8.  Exact
# quantiles at 100 TB need a global sort (or Spark's approx_percentile,
# whose internal GK summary isn't portable); a fixed-bin histogram is the
# deterministic alternative — cells merge by SUM across partitions and
# shards, the shuffle is bounded by the bin count, and the estimate
# (upper edge of the first bin whose cumulative count reaches ceil(q*n))
# is integer arithmetic both engines reproduce bit-exactly.  Error is
# bounded by the bin width by construction.
# ---------------------------------------------------------------------------

_BQ_WIDTH = 1000
_BQ_NBINS = 110  # l_extendedprice < ~105k
_BQ_QS = ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100))  # exact rationals


def _bq_bin(col: str) -> str:
    return (
        f"least(greatest(CAST(floor({col} / {_BQ_WIDTH}) AS BIGINT), 0),"
        f" {_BQ_NBINS - 1})"
    )


_BQ_ORACLE = f"""
WITH cells AS (
  SELECT {_bq_bin("l_extendedprice")} AS bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT bin, c,
         SUM(c) OVER (ORDER BY bin) AS cum,
         SUM(c) OVER () AS n
  FROM cells
),
q AS (
  SELECT cum.*, t.qn, t.qd
  FROM cum CROSS JOIN (VALUES {", ".join(f"({n}, {d})" for n, d in _BQ_QS)}) AS t(qn, qd)
)
SELECT CAST(qn AS DOUBLE) / qd AS q,
       MIN((bin + 1) * {_BQ_WIDTH}) AS est_upper,
       CAST(MIN(n) AS BIGINT) AS n
FROM q
WHERE cum >= (qn * n + qd - 1) // qd
GROUP BY qn, qd
"""


@register("sketch_binned_quantiles", oracle=_BQ_ORACLE, tags=("sketch", "A8"))
def sketch_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates (q = 0.25/0.5/0.75/0.9/0.99) of
    l_extendedprice from a {_BQ_NBINS}-bin histogram sketch: one
    partial-agg groupBy builds the cells; the cumulative pass and the
    per-q selection run on the {_BQ_NBINS}-row cell table (the
    unpartitioned window is bounded by the bin count, never the data).
    The q fan-out is a map-side explode of a literal array — no join, no
    cartesian."""
    li = table(spark, sf_dir, "lineitem")
    cells = (
        li.selectExpr(f"{_bq_bin('l_extendedprice')} AS bin")
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from pyspark.sql import Window

    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cells.select(
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    qs_arr = ", ".join(f"named_struct('qn', {n}, 'qd', {d})" for n, d in _BQ_QS)
    fanned = cum.selectExpr("bin", "cum", "n", f"explode(array({qs_arr})) AS qq")
    return (
        fanned.filter(F.expr("cum >= (qq.qn * n + qq.qd - 1) div qq.qd"))
        .groupBy("qq.qn", "qq.qd")
        .agg(
            F.min(F.expr(f"(bin + 1) * {_BQ_WIDTH}")).alias("est_upper"),
            F.min("n").alias("n"),
        )
        .selectExpr("CAST(qn AS DOUBLE) / qd AS q", "est_upper", "n")
    )


# ---------------------------------------------------------------------------
# HLL merge = rebuild: the property that makes sketches the incremental-
# ingestion answer at 100 TB — per-day cells built as data lands, merged
# by MAX into the running total, give EXACTLY the sketch a full rebuild
# would (MAX over day-partitioned cells == MAX over all rows).  The query
# computes both paths and emits both estimates per group; the oracle (and
# a unit test) pins them equal.
# ---------------------------------------------------------------------------

_HLL_DAY_US = 86_400 * 1_000_000


def _hll_day_expr_spark() -> str:
    return f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_HLL_DAY_US}"


_HLL_MERGE_ORACLE = f"""
WITH daily AS (
  SELECT l_returnflag AS grp,
         epoch_us(l_shipdate) // {_HLL_DAY_US} AS day,
         {_bucket_sql("l_orderkey")} AS bucket,
         MAX({_rank_sql("l_orderkey")}) AS r
  FROM lineitem GROUP BY 1, 2, 3
),
merged_cells AS (
  SELECT grp, bucket, MAX(r) AS r FROM daily GROUP BY 1, 2
),
direct_cells AS (
  SELECT l_returnflag AS grp,
         {_bucket_sql("l_orderkey")} AS bucket,
         MAX({_rank_sql("l_orderkey")}) AS r
  FROM lineitem GROUP BY 1, 2
),
m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS v_present,
         SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) AS z
  FROM merged_cells GROUP BY grp
),
d AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS v_present,
         SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) AS z
  FROM direct_cells GROUP BY grp
)
SELECT m.grp,
       (SELECT {_estimate_sql()} FROM (SELECT m.v_present AS v_present, m.z AS z)) AS est_merged,
       (SELECT {_estimate_sql()} FROM (SELECT d.v_present AS v_present, d.z AS z)) AS est_direct
FROM m JOIN d ON m.grp = d.grp
"""


@register("sketch_hll_merge_days", oracle=_HLL_MERGE_ORACLE, tags=("sketch", "A1"))
def sketch_hll_merge_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-partitioned HLL cells merged by MAX vs a direct full build:
    identical estimates per group (sketch mergeability), so a 100 TB
    pipeline maintains distinct counts by folding each day's cells into a
    running cell table instead of rescanning history.  Shuffle per day is
    bounded by |groups| x m cells."""
    li = table(spark, sf_dir, "lineitem")
    daily = (
        li.selectExpr(
            "l_returnflag AS grp",
            f"{_hll_day_expr_spark()} AS day",
            f"{_bucket_sql('l_orderkey')} AS bucket",
            f"{_rank_sql('l_orderkey')} AS rank",
        )
        .groupBy("grp", "day", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    merged_cells = daily.groupBy("grp", "bucket").agg(F.max("r").alias("r"))
    direct_cells = (
        li.selectExpr(
            "l_returnflag AS grp",
            f"{_bucket_sql('l_orderkey')} AS bucket",
            f"{_rank_sql('l_orderkey')} AS rank",
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("r"))
    )

    def estimate(cells: DataFrame, alias: str) -> DataFrame:
        sk = cells.groupBy("grp").agg(
            F.count("*").cast("long").alias("v_present"),
            F.sum(
                F.expr(
                    "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE)"
                )
            ).alias("z"),
        )
        return sk.selectExpr("grp", f"{_estimate_sql()} AS {alias}")

    return estimate(merged_cells, "est_merged").join(
        estimate(direct_cells, "est_direct"), "grp"
    )


# ---------------------------------------------------------------------------
# HLL set intersection via inclusion-exclusion
# ---------------------------------------------------------------------------

# |A∩B| ≈ est(A) + est(B) - est(A∪B); the union sketch is the cell-wise
# MAX merge, so intersection needs no second data structure — the whole
# point of mergeable sketches.  rsd ≈ 1.04/sqrt(m) ≈ 1.6% per estimate;
# the inclusion-exclusion error compounds to a few percent of |A|+|B|.
_HLL_IX_RTOL = 0.05  # |est - exact| <= 5% of (|A| + |B|)

_A_PRED = "o_orderstatus = 'O'"
_B_PRED = "o_orderstatus = 'F'"


def _hll_ix_cells_duck(pred: str) -> str:
    return f"""(
  SELECT {_bucket_sql("o_custkey")} AS bucket,
         MAX({_rank_sql("o_custkey")}) AS r
  FROM orders WHERE {pred} GROUP BY 1
)"""


def _hll_ix_est_duck(cells: str) -> str:
    return f"""(
  SELECT {_estimate_sql()} AS est FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS v_present,
           SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) AS z
    FROM {cells}
  )
)"""


_HLL_IX_ORACLE = f"""
WITH ua AS {_hll_ix_cells_duck(_A_PRED)},
ub AS {_hll_ix_cells_duck(_B_PRED)},
uu AS (
  SELECT bucket, MAX(r) AS r FROM (
    SELECT * FROM ua UNION ALL SELECT * FROM ub
  ) GROUP BY bucket
),
ex AS (
  SELECT COUNT(DISTINCT CASE WHEN {_A_PRED} THEN o_custkey END) AS n_a,
         COUNT(DISTINCT CASE WHEN {_B_PRED} THEN o_custkey END) AS n_b,
         COUNT(DISTINCT CASE WHEN o_custkey IN
             (SELECT o_custkey FROM orders WHERE {_B_PRED})
             AND {_A_PRED} THEN o_custkey END) AS n_inter
  FROM orders
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(ROUND(({_hll_ix_est_duck("ua")} + {_hll_ix_est_duck("ub")}
             - {_hll_ix_est_duck("uu")}) * 1e4) AS BIGINT) / 1e4 AS inter_est,
       CAST(CASE WHEN ABS({_hll_ix_est_duck("ua")} + {_hll_ix_est_duck("ub")}
             - {_hll_ix_est_duck("uu")} - n_inter)
             <= {_HLL_IX_RTOL} * (n_a + n_b) THEN 1 ELSE 0 END AS BIGINT) AS est_ok
FROM ex
"""


@register("sketch_hll_intersection", oracle=_HLL_IX_ORACLE, tags=("sketch", "eval"))
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection cardinality from HLL sketches by
    inclusion-exclusion: customers with open AND finished orders,
    estimated as est(A) + est(B) - est(A MAX-merge B) — no pairwise
    data structure, just the mergeable-sketch property (the union
    sketch is the same cell-wise MAX that sketch_hll_merge_days uses
    across partitions).  Exact counts computed in the same plan gate the
    estimate at {_HLL_IX_RTOL:.0%} of |A|+|B| (integer pass flag, so the
    claim is hash-checked).  Scale: three cell tables of m={_HLL_M}
    rows each, never the key space."""
    orders = table(spark, sf_dir, "orders")

    # tag-partitioned cell build: the 'u' (union) stream is the a+b
    # concatenation, so ONE groupBy(tag, bucket) MAX produces all three
    # sketches and ONE conditional aggregation collapses their per-tag
    # estimates to a single row — zero joins (a literal-key broadcast
    # join would constant-fold back into a BNLJ; see text_bm25_topk for
    # the same pattern note)
    def tagged(pred: str, tag: str):
        return orders.filter(pred).selectExpr(
            f"'{tag}' AS tag",
            f"{_bucket_sql('o_custkey')} AS bucket",
            f"{_rank_sql('o_custkey')} AS rank",
        )

    stream = (
        tagged(_A_PRED, "a")
        .unionByName(tagged(_B_PRED, "b"))
        .unionByName(tagged(_A_PRED, "u"))
        .unionByName(tagged(_B_PRED, "u"))
    )
    per_tag = (
        stream.groupBy("tag", "bucket")
        .agg(F.max("rank").alias("r"))
        .groupBy("tag")
        .agg(
            F.count("*").cast("long").alias("v_present"),
            F.sum(
                F.expr(
                    "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE)"
                )
            ).alias("z"),
        )
        .selectExpr("tag", f"{_estimate_sql()} AS est")
    )
    ests = per_tag.agg(
        F.max(F.when(F.col("tag") == "a", F.col("est"))).alias("ea"),
        F.max(F.when(F.col("tag") == "b", F.col("est"))).alias("eb"),
        F.max(F.when(F.col("tag") == "u", F.col("est"))).alias("eu"),
    )
    # exact counts: one per-customer flag pass, collected driver-side
    # (3 integers) and re-injected as literals — the scalar-subquery
    # execution model, bit-safe for integers
    flags = orders.groupBy("o_custkey").agg(
        F.max(F.expr(f"CASE WHEN {_A_PRED} THEN 1 ELSE 0 END")).alias("ia"),
        F.max(F.expr(f"CASE WHEN {_B_PRED} THEN 1 ELSE 0 END")).alias("ib"),
    )
    ex = flags.agg(
        F.sum("ia").alias("n_a"),
        F.sum("ib").alias("n_b"),
        F.sum(F.col("ia") * F.col("ib")).alias("n_inter"),
    ).first()
    n_a, n_b, n_inter = int(ex["n_a"]), int(ex["n_b"]), int(ex["n_inter"])
    return ests.selectExpr(
        f"CAST({n_a} AS BIGINT) AS n_a",
        f"CAST({n_b} AS BIGINT) AS n_b",
        f"CAST({n_inter} AS BIGINT) AS n_inter",
        "CAST(ROUND((ea + eb - eu) * 1e4) AS BIGINT) / 1e4 AS inter_est",
        f"CAST(CASE WHEN ABS(ea + eb - eu - {n_inter})"
        f" <= {_HLL_IX_RTOL} * ({n_a} + {n_b}) THEN 1 ELSE 0 END AS BIGINT) AS est_ok",
    )


# ---------------------------------------------------------------------------
# CMS error gate: estimate vs exact, the sketch-quality audit
# ---------------------------------------------------------------------------


def _cms_gate_oracle() -> str:
    from copperhead_spark.functions.text import token_hashes_duck

    cand_rows = ", ".join(
        f"('{t}', {s}, {b})" for t, s, b in _cms_candidates()
    )
    hash_rows = ", ".join(f"('{t}', {_token_hash_py(t)})" for t in _CMS_TERMS)
    arms = " UNION ALL ".join(
        f"SELECT {salt} AS salt, ({_mix_sql_text('th', salt)} % {_CMS_W}) AS bucket"
        " FROM toks"
        for salt in _CMS_SALTS
    )
    return f"""
WITH toks AS (
  SELECT unnest({token_hashes_duck("text")}) AS th FROM documents
),
cells AS (
  SELECT salt, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({arms})
  GROUP BY salt, bucket
),
cand(term, salt, bucket) AS (VALUES {cand_rows}),
est AS (
  SELECT term, MIN(COALESCE(c, 0)) AS est_count
  FROM cand LEFT JOIN cells USING (salt, bucket)
  GROUP BY term
),
th_map(term, th) AS (VALUES {hash_rows}),
exact AS (
  SELECT m.term, CAST(COUNT(t.th) AS BIGINT) AS exact_count
  FROM th_map m LEFT JOIN toks t ON t.th = m.th
  GROUP BY m.term
)
SELECT e.term, x.exact_count, e.est_count,
       e.est_count - x.exact_count AS overcount,
       CAST(CASE WHEN e.est_count >= x.exact_count THEN 1 ELSE 0 END AS BIGINT)
         AS never_undercounts
FROM est e JOIN exact x ON e.term = x.term
"""


@register("sketch_cms_error_gate", oracle=_cms_gate_oracle(), tags=("sketch", "quality-gate"))
def sketch_cms_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit for count-min: per probe term, the EXACT
    stream count next to the CMS estimate, the realized overcount, and
    the never-undercounts invariant as a pinned integer flag — the
    sketch twin of the ANN recall gates (SIM5): the approximation's
    error is itself an oracle-checked value, not a trust-me claim.
    Exact side is one partial-agg count over the token-hash stream
    filtered to the probe hashes (broadcast); at 100 TB both passes scan
    the corpus once and exchange only O(terms) / O(cells) rows."""
    from copperhead_spark.functions.text import token_hashes_spark

    est = sketch_cms_counts(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    th_map = spark.createDataFrame(
        [(t, _token_hash_py(t)) for t in _CMS_TERMS], "term string, th long"
    )
    toks = docs.selectExpr(f"explode({token_hashes_spark('text')}) AS th")
    # broadcast the 4-row probe map INTO the stream (map-side filter +
    # partial-agg count); terms absent from the stream are reinstated as
    # zero by the left join below, mirroring the oracle's LEFT JOIN
    exact = (
        toks.join(F.broadcast(th_map), "th")
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        est.join(exact, "term", "left")
        .select(
            "term",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
            "est_count",
            (F.col("est_count") - F.coalesce("exact_count", F.lit(0))).alias("overcount"),
            (F.col("est_count") >= F.coalesce("exact_count", F.lit(0)))
            .cast("long")
            .alias("never_undercounts"),
        )
    )


# ---------------------------------------------------------------------------
# bitmap-index audience intersection
# ---------------------------------------------------------------------------

# Overlapping audience segments over customers.  (name, predicate) in
# shared SQL text — identical on Spark and DuckDB.
_SEG_DEFS = (
    ("building", "c_mktsegment = 'BUILDING'"),
    ("even_key", "c_custkey % 2 = 0"),
    ("high_bal", "c_acctbal > 5000"),
    ("low_nation", "c_nationkey < 12"),
)


def _seg_oracle() -> str:
    # Textbook semantics: direct predicate-pair counts — deliberately NOT
    # the bitmap construction, so the bitmap path is proven against an
    # independent derivation.
    rows = []
    for i, (na, pa) in enumerate(_SEG_DEFS):
        for nb, pb in _SEG_DEFS[i + 1 :]:
            rows.append(
                f"""SELECT '{na}' AS seg_a, '{nb}' AS seg_b,
       CAST(SUM(CASE WHEN {pa} THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(SUM(CASE WHEN {pb} THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST(SUM(CASE WHEN ({pa}) AND ({pb}) THEN 1 ELSE 0 END) AS BIGINT) AS n_both
FROM customer"""
            )
        u = "\nUNION ALL\n".join(rows)
    return f"""
WITH p AS ({u})
SELECT seg_a, seg_b, n_a, n_b, n_both,
       CAST((n_both * 1000000) // (n_a + n_b - n_both) AS BIGINT) AS jaccard_e6
FROM p ORDER BY seg_a, seg_b
"""


@register("seg_bitmap_intersect", oracle=_seg_oracle(), tags=("sketch", "bitmap"))
def seg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap analytics on a bitmap index: each segment's
    membership is packed into 64-bit words (word = custkey DIV 64, bit =
    custkey % 64, bit_or aggregate), and every pairwise overlap is then
    an equi-join of the two segments' word lists + popcount of the AND —
    the roaring-bitmap OLAP pattern, 64 members per row of state.  The
    oracle computes the same counts DIRECTLY from the predicates
    (independent derivation), so the bitmap encode/AND/popcount path is
    value-proven, including sizes recovered purely from popcounts.

    Scale design: the per-(segment, word) bit_or is one partial-agg
    shuffle that compresses membership 64x before any pairwise work;
    intersections never touch the membership rows again — they join the
    compressed words (|universe|/64 rows per segment, co-partitioned on
    word index).  Adding a segment is one scan; overlap queries are
    metadata-sized thereafter.  This is how audience/cohort engines
    (Druid, ClickHouse bitmap dictionaries) answer set algebra at 100 TB.

    Reference analogue: the trigger-path overlap matrices of P2/P3
    (OR/AND of boolean masks) lifted from per-row flags to compressed
    set algebra."""
    cust = table(spark, sf_dir, "customer")
    arms = ", ".join(
        f"IF({pred}, '{name}', CAST(NULL AS STRING))" for name, pred in _SEG_DEFS
    )
    member = cust.selectExpr(
        "c_custkey", f"explode(filter(array({arms}), x -> x IS NOT NULL)) AS seg"
    )
    words = (
        member.selectExpr(
            "seg",
            "c_custkey DIV 64 AS w",
            "shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 64 AS INT)) AS bit",
        )
        .groupBy("seg", "w")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )
    sizes = words.groupBy("seg").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("n")
    )
    a = words.selectExpr("seg AS seg_a", "w", "bm AS bm_a")
    b = words.selectExpr("seg AS seg_b", "w", "bm AS bm_b")
    overlap = (
        a.join(b, "w")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.sum(F.bit_count(F.expr("bm_a & bm_b"))).cast("long").alias("n_both"))
    )
    # Anchor on the static pair roster so a segment pair sharing ZERO
    # word indices still emits an n_both=0 row (the word-list inner join
    # alone would drop it; the oracle emits every pair).  The roster is
    # config-sized — a literal frame, no data pass.
    names = sorted(n for n, _ in _SEG_DEFS)
    roster = spark.createDataFrame(
        [(x, y) for i, x in enumerate(names) for y in names[i + 1 :]],
        "seg_a string, seg_b string",
    )
    inter = roster.join(overlap, ["seg_a", "seg_b"], "left").select(
        "seg_a", "seg_b", F.coalesce("n_both", F.lit(0)).alias("n_both")
    )
    return (
        inter.join(F.broadcast(sizes.selectExpr("seg AS seg_a", "n AS n_a")), "seg_a")
        .join(F.broadcast(sizes.selectExpr("seg AS seg_b", "n AS n_b")), "seg_b")
        .selectExpr(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_both",
            "CAST((n_both * 1000000) DIV (n_a + n_b - n_both) AS BIGINT)"
            " AS jaccard_e6",
        )
        .orderBy("seg_a", "seg_b")
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
