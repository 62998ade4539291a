"""Checklist-completing operators (SURVEY.md §2: P9, P11, P12, U2, S6,
A11 ★) — small but distinct reference behaviors not covered by the core
relational module."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum_sql
from copperhead_spark.functions.hashing import mix_sql
from copperhead_spark.operators.histogram import histogram
from copperhead_spark.plans.registry import register


@register(
    "p9_select_rename_flatten",
    oracle="""
SELECT l_orderkey AS event,
       l_linenumber AS subentry,
       l_extendedprice AS price_nominal,
       l_extendedprice * (1 - l_discount) AS price_disc_up,
       l_quantity AS qty_nominal
FROM lineitem
WHERE l_orderkey < 500
""",
    tags=("P9",),
)
def p9_select_rename_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subsetting + MultiIndex-name flattening on save
    (processor.py:490-503: (Variable, Variation) -> 'var_variation'
    strings, deterministic column order).  Pure projection; per-row
    product is IEEE-deterministic so raw doubles are compared."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        F.col("l_orderkey").alias("event"),
        F.col("l_linenumber").alias("subentry"),
        F.col("l_extendedprice").alias("price_nominal"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("price_disc_up"),
        F.col("l_quantity").alias("qty_nominal"),
    )


@register(
    "p11_dataset_relabel_split",
    oracle="""
SELECT CASE WHEN lang = 'en' THEN source || '_01j' ELSE source || '_2j' END AS dataset,
       COUNT(*) AS n
FROM documents
GROUP BY 1
""",
    tags=("P11",),
)
def p11_dataset_relabel_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genjet-multiplicity dataset relabeling (postprocessor.py:111-123:
    DY -> {ds}_01j / {ds}_2j by matched-gen booleans): conditional label
    rewrite + concat."""
    docs = table(spark, sf_dir, "documents")
    label = F.when(
        F.col("lang") == "en", F.concat(F.col("source"), F.lit("_01j"))
    ).otherwise(F.concat(F.col("source"), F.lit("_2j")))
    return docs.groupBy(label.alias("dataset")).agg(F.count("*").alias("n"))


@register(
    "p12_overlap_removal",
    oracle=f"""
SELECT src, COUNT(*) AS n, {exact_sum_sql("o_totalprice")} AS total
FROM (
  SELECT 'incl' AS src, o_totalprice FROM orders WHERE o_totalprice <= 150000
  UNION ALL
  SELECT 'filtered' AS src, o_totalprice FROM orders WHERE o_totalprice > 150000
)
GROUP BY src
""",
    tags=("P12", "U1"),
)
def p12_overlap_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VBF-filter overlap removal (postprocessor.py:85-89): two samples
    covering complementary phase-space slices stitched without double
    counting — complementary filters + union."""
    orders = table(spark, sf_dir, "orders")
    incl = orders.filter(F.col("o_totalprice") <= 150000).select(
        F.lit("incl").alias("src"), "o_totalprice"
    )
    filt = orders.filter(F.col("o_totalprice") > 150000).select(
        F.lit("filtered").alias("src"), "o_totalprice"
    )
    from copperhead_spark.functions.exact import exact_sum

    return (
        incl.unionByName(filt)
        .groupBy("src")
        .agg(F.count("*").alias("n"), exact_sum(F.col("o_totalprice")).alias("total"))
    )


@register(
    "u2_intersect",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("U2",),
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (common systematic-variation sets across datasets,
    make_templates.py:92-104)."""
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersect(o)


@register(
    "u4_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("U2", "except"),
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — noted as available-if-needed in the reference's set-op
    inventory (SURVEY §2.7): customers with finished but no open orders
    (non-empty on the testdata, so the check is not vacuous)."""
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    # subtract == EXCEPT (set semantics); exceptAll would keep
    # multiplicity differences and disagree with SQL EXCEPT
    return f.subtract(o)


@register(
    "s6_metadata_prescan",
    oracle="""
SELECT o_orderstatus AS dataset,
       COUNT(*) AS n_events,
       CAST(1000000 AS DOUBLE) / COUNT(*) AS lumi_weight
FROM orders
GROUP BY o_orderstatus
""",
    tags=("S6", "A4"),
)
def s6_metadata_prescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pre-scan aggregate (preprocessor.py:150-229: sum
    genEventSumw per dataset -> lumi_weight = xsec*lumi/N): one small agg
    job whose result is broadcast into the main query as a scalar map."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("dataset")).agg(
        F.count("*").alias("n_events"),
        (F.lit(1000000).cast("double") / F.count("*")).alias("lumi_weight"),
    )


@register(
    "a11_histogram_merge",
    oracle=f"""
WITH h AS (
  SELECT l_returnflag AS region,
         CAST(CASE WHEN l_extendedprice < 0.0 THEN -1
              WHEN l_extendedprice >= 110000.0 THEN 55
              ELSE CAST(FLOOR((l_extendedprice - 0.0) / 2000.0) AS BIGINT) END AS BIGINT)
           AS bin_idx,
         {exact_sum_sql("1 - l_discount", 4)} AS value,
         {exact_sum_sql("(1 - l_discount) * (1 - l_discount)", 8)} AS sumw2
  FROM lineitem GROUP BY 1, 2
)
SELECT region, (bin_idx + 2) // 2 - 1 AS coarse_bin,
       SUM(value) AS value, SUM(sumw2) AS sumw2
FROM h GROUP BY 1, 2
""",
    tags=("A11",),
)
def a11_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial->final histogram merge (make_templates.py:128-155 /
    plotter.py:262-289 rebinning): re-aggregate the fine histogram table
    into coarser bins (shift-before-divide keeps trunc-vs-floor integer
    division semantics aligned for the -1 underflow bin).  Bin pairs merge exactly (FP addition of two
    addends is commutative, so shuffle order cannot change the result)."""
    li = table(spark, sf_dir, "lineitem")
    fine = histogram(
        li,
        value=F.col("l_extendedprice"),
        lo=0.0,
        hi=110000.0,
        nbins=55,
        by=[F.col("l_returnflag").alias("region")],
        weight=1 - F.col("l_discount"),
    )
    return fine.selectExpr("region", "(bin_idx + 2) div 2 - 1 AS coarse_bin", "value", "sumw2").groupBy(
        "region", "coarse_bin"
    ).agg(F.sum("value").alias("value"), F.sum("sumw2").alias("sumw2"))


@register(
    "u5_multiset_set_ops",
    oracle="""
WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
ia AS (SELECT o_custkey FROM f INTERSECT ALL SELECT o_custkey FROM o),
ea AS (SELECT o_custkey FROM f EXCEPT ALL SELECT o_custkey FROM o)
SELECT 'intersect_all' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM ia GROUP BY o_custkey
UNION ALL
SELECT 'except_all' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM ea GROUP BY o_custkey
""",
    tags=("U5", "setops"),
)
def u5_multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL keeps min(m1, m2)
    copies per key and EXCEPT ALL keeps max(m1 - m2, 0), semantics the
    DISTINCT forms (u2/u4) cannot express: how many finished orders a
    customer has BEYOND their open orders matters, not just whether any
    exist.  Multiplicities are re-aggregated so the output is one row
    per (op, key) — deterministic and hashable.  Scale: both ops plan as
    one hash aggregation per side plus a join-like merge on the key; no
    sort, same exchange shape as a groupBy."""
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    ia = (
        f.intersectAll(o)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("multiplicity"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "multiplicity")
    )
    ea = (
        f.exceptAll(o)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "multiplicity")
    )
    return ia.unionByName(ea)


@register(
    "j15_exists_subquery",
    oracle="""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 500000)
GROUP BY n_name
""",
    tags=("J15", "sql"),
)
def j15_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS SQL surface: customers with an
    open order but no half-million-value order, per nation — Catalyst
    rewrites the pair into a LeftSemi and a LeftAnti join (visible in
    the plan), so the user writes tuple-at-a-time logic and gets the
    set-based join the DataFrame API (j2) spells explicitly.  Scale:
    both rewrites shuffle on the correlation key like any equi-join; the
    orders side aggregates to distinct keys before the anti probe."""
    from copperhead_spark.catalog import register_views

    register_views(spark, sf_dir, names=("customer", "nation", "orders"))
    return spark.sql(
        """
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 500000)
        GROUP BY n_name
        """
    )


@register(
    "j16_null_safe_join",
    oracle="""
WITH a AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey % 13 = 0 THEN NULL ELSE o_custkey % 100 END AS k
  FROM orders WHERE o_orderstatus = 'O'
),
b AS (
  SELECT CASE WHEN o_custkey % 13 = 0 THEN NULL ELSE o_custkey % 100 END AS k,
         CAST(COUNT(*) AS BIGINT) AS n_f
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY 1
)
SELECT CAST(COALESCE(a.k, -1) AS BIGINT) AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_open,
       CAST(MAX(b.n_f) AS BIGINT) AS n_finished
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
""",
    tags=("J16", "nulls"),
)
def j16_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL bucket
    MATCHES the NULL bucket — plain `=` silently drops every null-keyed
    row from both sides, the classic quiet row-loss when joining on a
    nullable dimension key (here every 13th customer's bucket is NULL).
    Spark plans <=> as a normal hash equi-join with null-safe key
    comparison, so the scale shape is identical to any equi-join (one
    exchange per side); the NULL group is also the canonical skew key —
    at 100 TB pair this with the salted-join pattern (sk2) if the
    unknown-key bucket is hot."""
    orders = table(spark, sf_dir, "orders")
    k = F.when(F.col("o_custkey") % 13 == 0, F.lit(None)).otherwise(
        F.col("o_custkey") % 100
    )
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", k.alias("k")
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(k.alias("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_f"))
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .groupBy(F.coalesce(a.k, F.lit(-1)).cast("long").alias("k_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_open"),
            F.max("n_f").cast("long").alias("n_finished"),
        )
    )


@register(
    "dq_constraint_report",
    oracle="""
WITH o AS (SELECT * FROM orders)
SELECT 'o_orderkey_unique' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations,
       CAST(COUNT(*) AS BIGINT) AS n_checked
FROM o
UNION ALL
SELECT 'o_custkey_not_null',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM o
UNION ALL
SELECT 'o_totalprice_positive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM o
UNION ALL
SELECT 'o_orderstatus_domain',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM o
UNION ALL
SELECT 'orders_custkey_ref_integrity',
       CAST(COUNT(*) AS BIGINT),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM o)
FROM o LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL
""",
    tags=("DQ1", "quality"),
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report (the Deequ/Great-Expectations
    shape): key uniqueness, non-null, value range, domain membership,
    and referential integrity, each as one (check, violations,
    n_checked) row — the gate a 100 TB ingest runs BEFORE publishing a
    partition.  ALL five checks share one scan + one aggregation pass
    (each constraint is a conditional sum; referential integrity rides
    the same pass via a broadcast left join against the dimension), so
    adding a check adds a column, not a pass.  Zero violations on the testdata, so a green row
    proves the checks ran, not that they are vacuous — flip any
    constraint to see a count."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    # ONE broadcast left join + ONE aggregation computes every check
    # (referential integrity is just another conditional sum over the
    # joined row), then stack() pivots the single row into the report —
    # fully LAZY, so the plan audit sees the real scan/join/agg plan
    # instead of a LocalTableScan of pre-collected values
    oj = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left"
    )
    onepass = oj.agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("v_uniq"),
        F.sum(F.col("o_custkey").isNull().cast("long")).cast("long").alias("v_null"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).cast("long").alias("v_range"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long"))
        .cast("long")
        .alias("v_domain"),
        F.sum(F.col("c_custkey").isNull().cast("long")).cast("long").alias("v_ref"),
    )
    return onepass.selectExpr(
        """stack(5,
             'o_orderkey_unique', v_uniq,
             'o_custkey_not_null', v_null,
             'o_totalprice_positive', v_range,
             'o_orderstatus_domain', v_domain,
             'orders_custkey_ref_integrity', v_ref
           ) AS (check_name, violations)""",
        "n AS n_checked",
    )


@register(
    "scd2_dimension_build",
    oracle="""
WITH changes AS (
  SELECT o_custkey, o_orderdate AS valid_from, o_orderstatus AS status,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
),
daily AS (SELECT o_custkey, valid_from, status FROM changes WHERE rn = 1),
dedup AS (
  SELECT * FROM (
    SELECT o_custkey, valid_from, status,
           LAG(status) OVER w AS prev_status
    FROM daily
    WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from)
  ) WHERE prev_status IS NULL OR status <> prev_status
)
SELECT o_custkey, status,
       CAST(valid_from AS DATE) AS valid_from,
       CAST(LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
            AS DATE) AS valid_to,
       CAST((LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
             IS NULL) AS BIGINT) AS is_current
FROM dedup
""",
    tags=("SCD2", "warehouse"),
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change stream: per
    customer, the order-status history collapses to one row per STATUS
    RUN with [valid_from, valid_to) validity and an is_current flag —
    lag() drops same-as-previous days (no spurious versions), lead()
    closes each interval with the next version's start.  Ties within a
    day resolve to the highest order key (deterministic last-write-wins,
    the same rule a CDC consumer applies).  This is the point-in-time
    dimension every as-of join (j8/asof_*) probes.  Scale: two windows
    over the same per-customer partition — one exchange, sorted once."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    daily = (
        orders.select(
            "o_custkey",
            F.col("o_orderdate").alias("valid_from"),
            F.col("o_orderstatus").alias("status"),
            F.row_number().over(wd).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w = Window.partitionBy("o_custkey").orderBy("valid_from")
    dedup = daily.withColumn("prev_status", F.lag("status").over(w)).filter(
        F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status"))
    )
    return dedup.select(
        "o_custkey",
        "status",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.lead("valid_from").over(w).cast("date").alias("valid_to"),
        F.lead("valid_from").over(w).isNull().cast("long").alias("is_current"),
    )


_SCD2_DIM_SQL = """
WITH changes AS (
  SELECT o_custkey, o_orderdate AS valid_from, o_orderstatus AS status,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
),
daily AS (SELECT o_custkey, valid_from, status FROM changes WHERE rn = 1),
dedup AS (
  SELECT * FROM (
    SELECT o_custkey, valid_from, status,
           LAG(status) OVER w AS prev_status
    FROM daily
    WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from)
  ) WHERE prev_status IS NULL OR status <> prev_status
),
dim AS (
  SELECT o_custkey AS d_custkey, status, valid_from,
         LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
           AS valid_to
  FROM dedup
)
"""


@register(
    "j19_scd2_temporal_join",
    oracle=f"""
{_SCD2_DIM_SQL}
SELECT o.o_orderkey, o.o_custkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       d.status AS status_at_order,
       CAST((d.valid_to IS NULL) AS BIGINT) AS from_current_version
FROM orders o
JOIN dim d
  ON d.d_custkey = o.o_custkey
 AND d.valid_from <= o.o_orderdate
 AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
""",
    tags=("J19", "SCD2", "temporal"),
)
def j19_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of validity) enrichment against the SCD2
    dimension scd2_dimension_build produces: each fact row picks the
    dimension version whose [valid_from, valid_to) interval covers its
    date.  Because the versions share a HIGH-CARDINALITY equi key
    (custkey) and each key holds a handful of versions, the scale-correct
    plan is a plain hash equi-join on the key with the validity range as
    a post-join filter — no interval-bucket expansion needed (that
    machinery, j17, is for range joins WITHOUT an equi key).  Intervals
    are non-overlapping by construction, so the join is 1:1 and the
    output has exactly one row per fact."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    w = Window.partitionBy("o_custkey").orderBy("valid_from")
    dim = (
        orders.select(
            "o_custkey",
            F.col("o_orderdate").alias("valid_from"),
            F.col("o_orderstatus").alias("status"),
            F.row_number().over(wd).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("prev_status", F.lag("status").over(w))
        .filter(F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status")))
        .select(
            F.col("o_custkey").alias("d_custkey"),
            "status",
            "valid_from",
            F.lead("valid_from").over(w).alias("valid_to"),
        )
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        o.join(
            dim,
            (dim.d_custkey == o.o_custkey)
            & (dim.valid_from <= o.o_orderdate)
            & (dim.valid_to.isNull() | (o.o_orderdate < dim.valid_to)),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("status").alias("status_at_order"),
            F.col("valid_to").isNull().cast("long").alias("from_current_version"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit data-quality profile
# ---------------------------------------------------------------------------

# integer CASE ladder: o_totalprice < 10^7 in TPC-H at any published SF,
# so six divisions reach the leading digit with no float log10 (whose
# ulp wobble at exact powers of ten could flip a digit)
_BENFORD_DIGIT = """
CASE WHEN i >= 1000000 THEN i DIV 1000000
     WHEN i >= 100000 THEN i DIV 100000
     WHEN i >= 10000 THEN i DIV 10000
     WHEN i >= 1000 THEN i DIV 1000
     WHEN i >= 100 THEN i DIV 100
     WHEN i >= 10 THEN i DIV 10
     ELSE i END
"""


@register(
    "dq_benford_profile",
    oracle=f"""
WITH d AS (
  SELECT {_BENFORD_DIGIT.replace("DIV", "//")} AS digit
  FROM (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS i FROM orders)
),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT digit, n, CAST(SUM(n) OVER () AS BIGINT) AS total FROM c)
SELECT digit, n,
       (n * 1000000000) // total AS observed_ppb,
       CAST(ROUND(LN(1e0 + CAST(1 AS DOUBLE) / digit)
                  / LN(CAST(10 AS DOUBLE)) * 1e9) AS BIGINT) AS expected_ppb,
       ABS((n * 1000000000) // total
           - CAST(ROUND(LN(1e0 + CAST(1 AS DOUBLE) / digit)
                        / LN(CAST(10 AS DOUBLE)) * 1e9) AS BIGINT)) AS deviation_ppb
FROM t
""",
    tags=("dq", "aggregate"),
)
def dq_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    leading-digit frequencies (parts-per-billion, exact integer
    division) against the log10(1+1/d) expectation, with absolute
    deviation per digit — the fraud/corruption screen a data-quality
    suite runs over every monetary column.

    The leading digit comes from an integer CASE ladder (no float
    log10, whose ulp wobble at exact powers of ten could flip a digit);
    the only transcendental is the expectation itself, computed from
    digit literals and rounded through 1e-9 fixed point on both engines.

    Scale design: one partial-agg shuffle to 9 digit rows; the global
    total is a window over those 9 rows — bytes, not data.  The scan
    reads exactly one column.

    Reference analogue: none (data-quality extension alongside
    dq_skew_profile and dq_constraint_report)."""
    d = table(spark, sf_dir, "orders").selectExpr(
        "CAST(FLOOR(o_totalprice) AS BIGINT) AS i"
    ).selectExpr(f"{_BENFORD_DIGIT} AS digit")
    c = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    from pyspark.sql import Window

    t = c.withColumn("total", F.sum("n").over(Window.partitionBy()).cast("long"))
    exp_ppb = (
        "CAST(ROUND(LN(1e0 + CAST(1 AS DOUBLE) / digit)"
        " / LN(CAST(10 AS DOUBLE)) * 1e9) AS BIGINT)"
    )
    return t.selectExpr(
        "digit",
        "n",
        "(n * 1000000000) DIV total AS observed_ppb",
        f"{exp_ppb} AS expected_ppb",
        f"ABS((n * 1000000000) DIV total - {exp_ppb}) AS deviation_ppb",
    )


# ---------------------------------------------------------------------------
# incremental materialized-aggregate refresh (merge delta into standing MV)
# ---------------------------------------------------------------------------


@register(
    "m1_incremental_agg_refresh",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_c
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    tags=("lakehouse", "incremental"),
)
def m1_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance for a distributive
    aggregate: the standing MV is built from the 90% base slice and
    MATERIALIZED (localCheckpoint = the cluster's MV table); the 10%
    delta slice is aggregated alone and merged by re-aggregating the
    union of the two summaries.  The oracle is the FULL REBUILD over
    the unsplit table, so the value hash proves incremental == rebuild
    — the algebraic property (count/sum are distributive over any
    partition of the input) that lets a 100 TB nightly refresh touch
    only the new partition instead of re-scanning history.

    Scale: base scan happens once into group-level rows (bytes); each
    refresh costs one delta scan + a groups-sized merge shuffle.
    AVG-class measures derive from (sum, count) at read time; true
    holistic aggregates (distinct, quantiles) need the sketch path
    (sketch_hll_merge_days demonstrates merge=rebuild for those).

    Reference analogue: the histogram-merge accumulation step
    (A11, python/postprocessor.py histogram summation) — same
    merge-of-partials algebra on relational aggregates."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
            .cast("long")
            .alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_price_c"),
        )

    mv = _agg(li.filter(F.col("l_orderkey") % 10 != 0)).localCheckpoint()
    delta = _agg(li.filter(F.col("l_orderkey") % 10 == 0))
    return (
        mv.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_qty_c").cast("long").alias("sum_qty_c"),
            F.sum("sum_price_c").cast("long").alias("sum_price_c"),
        )
    )


# ---------------------------------------------------------------------------
# partition-level reconciliation fingerprints (Merkle-style audit)
# ---------------------------------------------------------------------------

_FP_SALT_A, _FP_SALT_B = 97, 193


def _fp_rowhash() -> str:
    """Row-content hash shared by both engines: canonical key mix folded
    with a quantity-sensitive second mix, stays < 2^31."""
    inner = mix_sql("l_orderkey * 7 + l_linenumber", _FP_SALT_A)
    return mix_sql(f"{inner} + CAST(ROUND(l_quantity) AS BIGINT) * 31", _FP_SALT_B)


_FP_ORACLE = f"""
SELECT COALESCE(month, -1) AS month, n_rows, xor_fp, sum_fp FROM (
  SELECT CAST(EXTRACT(year FROM l_shipdate) * 100
              + EXTRACT(month FROM l_shipdate) AS BIGINT) AS month,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(BIT_XOR({_fp_rowhash()}) AS BIGINT) AS xor_fp,
         CAST(SUM({_fp_rowhash()} % 999999937) % 999999937 AS BIGINT) AS sum_fp
  FROM lineitem
  GROUP BY ROLLUP (1)
)
ORDER BY month
"""


@register("dq_merkle_fingerprint", oracle=_FP_ORACLE, tags=("dq", "audit"))
def dq_merkle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level content fingerprints for cross-system
    reconciliation: per ship-month (plus the ROLLUP grand total), the
    row count, an order-free XOR fold of a per-row content hash, and a
    modular sum fold (XOR alone cannot see a row duplicated twice; the
    mod-p sum can, and it never overflows because every addend is
    already reduced).  Two engines agreeing on (n, xor, sum) per
    partition is the cheap way to prove a 100 TB copy is intact —
    comparing fingerprints moves calendar-sized data, re-comparing rows
    moves everything.

    Exactness: the row hash is the portable quadratic mix (< 2^31);
    both folds are associative and commutative, so the result is
    independent of partitioning and merge order — the property that
    makes the fingerprint well-defined across engines and cluster
    layouts.

    Scale design: one partial-agg shuffle, month-cardinality output;
    the ROLLUP total comes from the same pass.  Matches the
    delete-propagation / snapshot-diff family (s18, corpus_snapshot_
    diff) with a constant-size certificate instead of row-level diffs.

    Reference analogue: the reference trusts file counts + event sums
    (io.py save/load round-trips); this is the same audit, made
    content-sensitive."""
    li = table(spark, sf_dir, "lineitem")
    rh = _fp_rowhash()
    return (
        li.selectExpr(
            "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS month",
            f"{rh} AS rh",
        )
        .rollup("month")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(rh)").cast("long").alias("xor_fp"),
            F.expr("SUM(rh % 999999937) % 999999937").cast("long").alias("sum_fp"),
        )
        .selectExpr(
            "COALESCE(month, -1) AS month", "n_rows", "xor_fp", "sum_fp"
        )
        .orderBy("month")
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
