"""Array / nested-data layer (SURVEY.md §2.8 array functions ★, §2.4 A9).

The reference's jagged awkward operations map to Spark higher-order
functions: ak.count -> size, positional slice -> slice, element pick ->
element_at, ak.all -> forall, elementwise ak.where -> transform, flatten
-> posexplode (SURVEY.md §2.8 table).  Exercised here on the embeddings
table (array<float>, 64-dim).

Float arrays are summed in micro-unit integer space (round(x*1e6) per
element) so sums/maxima are order-independent and bit-exact across
engines — same discipline as functions/exact.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.plans.registry import register

_MICRO = "CAST(ROUND(CAST({e} AS DOUBLE) * 1000000) AS BIGINT)"


@register(
    "arr_slice_stats",
    oracle=f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       {_MICRO.format(e="embedding[1]")} AS first_micro,
       CAST(list_aggregate(list_transform(embedding[1:16],
            e -> {_MICRO.format(e="e")}), 'sum') AS BIGINT) AS slice_sum_micro,
       CAST(list_aggregate(list_transform(embedding,
            e -> {_MICRO.format(e="e")}), 'max') AS BIGINT) AS max_micro,
       SQRT(CAST(16 * list_aggregate(list_transform(embedding[1:16],
              e -> {_MICRO.format(e="e")} * {_MICRO.format(e="e")}), 'sum')
            - list_aggregate(list_transform(embedding[1:16],
              e -> {_MICRO.format(e="e")}), 'sum')
            * list_aggregate(list_transform(embedding[1:16],
              e -> {_MICRO.format(e="e")}), 'sum') AS DOUBLE))
         / (16 * CAST(1000000 AS DOUBLE)) AS slice_std
FROM embeddings
""",
    tags=("A9", "array"),
)
def arr_slice_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice / element_at / size / aggregate + per-row stddev over
    a slice (PDF-weight sigma over first-N replicas,
    pdf_variations.py:20-30).  All HOFs run JVM-side; the stddev is
    integer-exact up to the final sqrt."""
    emb = table(spark, sf_dir, "embeddings")
    m = _MICRO.format(e="e")
    return emb.selectExpr(
        "vec_id",
        "CAST(size(embedding) AS BIGINT) AS dim",
        f"{_MICRO.format(e='element_at(embedding, 1)')} AS first_micro",
        f"aggregate(transform(slice(embedding, 1, 16), e -> {m}),"
        f" CAST(0 AS BIGINT), (a, b) -> a + b) AS slice_sum_micro",
        f"array_max(transform(embedding, e -> {m})) AS max_micro",
        f"SQRT(CAST(16 * aggregate(transform(slice(embedding, 1, 16), e -> {m} * {m}),"
        f"         CAST(0 AS BIGINT), (a, b) -> a + b)"
        f"    - aggregate(transform(slice(embedding, 1, 16), e -> {m}),"
        f"         CAST(0 AS BIGINT), (a, b) -> a + b)"
        f"    * aggregate(transform(slice(embedding, 1, 16), e -> {m}),"
        f"         CAST(0 AS BIGINT), (a, b) -> a + b) AS DOUBLE))"
        f" / (16 * CAST(1000000 AS DOUBLE)) AS slice_std",
    )


@register(
    "arr_forall_exists",
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN len(list_filter(embedding,
             e -> ABS(CAST(e AS DOUBLE)) > 0.5)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounded,
       CAST(SUM(CASE WHEN len(list_filter(embedding,
             e -> CAST(e AS DOUBLE) > 0.4)) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_has_large
FROM embeddings
GROUP BY label
""",
    tags=("array", "J3"),
)
def arr_forall_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified predicates over arrays (ak.all isolation check,
    jets.py:195 -> forall; any-match -> exists)."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.selectExpr(
            "label",
            "forall(embedding, e -> ABS(CAST(e AS DOUBLE)) <= 0.5) AS bounded",
            "exists(embedding, e -> CAST(e AS DOUBLE) > 0.4) AS has_large",
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.when(F.col("bounded"), 1).otherwise(0)).alias("n_bounded"),
            F.sum(F.when(F.col("has_large"), 1).otherwise(0)).alias("n_has_large"),
        )
    )


@register(
    "arr_posexplode",
    oracle=f"""
SELECT vec_id, i AS pos,
       {_MICRO.format(e="embedding[i + 1]")} AS val_micro
FROM embeddings, range(0, 8) t(i)
WHERE vec_id < 50
""",
    tags=("array",),
)
def arr_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jagged flatten with position (ak.to_pandas multi-index ->
    posexplode(event_id, idx, fields), SURVEY.md §2.8): first 8 elements
    of each vector as child rows."""
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 8))
    ).selectExpr(
        "vec_id",
        "CAST(pos AS BIGINT) AS pos",
        _MICRO.format(e="col") + " AS val_micro",
    )


@register(
    "map_props_explode",
    oracle="""
WITH base AS (
  SELECT event_type, props,
         CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
              ELSE json_keys(props) END AS ks
  FROM events
),
kv AS (
  SELECT event_type, k AS prop_key,
         CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS val
  FROM (SELECT event_type, props, unnest(ks) AS k
        FROM base WHERE ks IS NOT NULL AND len(ks) > 0)
),
nullrows AS (
  SELECT event_type, CAST(NULL AS VARCHAR) AS prop_key,
         CAST(NULL AS BIGINT) AS val
  FROM base WHERE ks IS NULL OR len(ks) = 0
),
allkv AS (SELECT * FROM kv UNION ALL SELECT * FROM nullrows)
SELECT event_type, prop_key,
       COUNT(*) AS n,
       CAST(SUM(val) AS BIGINT) AS val_sum,
       CAST(MIN(val) AS BIGINT) AS val_min
FROM allkv
GROUP BY event_type, prop_key
""",
    tags=("map", "functions", "json"),
)
def map_props_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: the props JSON bag parses once into
    map<string,bigint> (from_json with a map schema — the schema-on-read
    shape for property bags whose KEY SET is not fixed at plan time,
    where a struct schema would silently drop unknown keys), then
    explode_outer(map) yields one (key, value) row per entry — and ONE
    NULL-keyed row for NULL/unparseable/empty bags, so dirty rows are
    counted, not silently dropped.  The oracle discovers the key set
    itself (json_keys + dynamic extract) with an explicit branch for the
    dirty rows, so the parity holds for ANY corpus, not just one whose
    every row happens to parse with the same key — a map-explode bug
    that drops or duplicates entries breaks the row count, a parse
    drift breaks the sums.  Scale: parse + explode are map-side; the
    aggregate is one partial-agg exchange keyed (event_type, key)."""
    ev = table(spark, sf_dir, "events")
    kv = ev.select(
        "event_type",
        F.explode_outer(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "val"
        ),
    )
    return kv.groupBy("event_type", "prop_key").agg(
        F.count("*").alias("n"),
        F.sum("val").alias("val_sum"),
        F.min("val").alias("val_min"),
    )


@register(
    "arr_explode_outer",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CASE WHEN n_chars % 7 = 0 THEN CAST([] AS BIGINT[])
              ELSE list_transform(range(1, 2 + n_chars % 4),
                                  i -> CAST(doc_id * 10 + i AS BIGINT)) END AS xs
  FROM documents
),
e AS (
  SELECT doc_id, unnest(CASE WHEN len(xs) = 0 THEN [NULL] ELSE xs END) AS x
  FROM d
)
SELECT doc_id, x, CAST((x IS NULL) AS BIGINT) AS from_empty
FROM e
""",
    tags=("arrays", "functions"),
)
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (LATERAL VIEW OUTER semantics): rows with
    an EMPTY array survive as one NULL-valued row instead of vanishing —
    the difference between 'this doc has no attachments' and 'this doc
    never existed', which plain explode silently erases (a classic
    row-loss bug in fan-out joins).  The synthetic array derives
    deterministically from doc columns; every 7th doc gets an empty one
    so the outer semantics are non-vacuous.  Map-side Generate either
    way; no shuffle."""
    docs = table(spark, sf_dir, "documents")
    d = docs.selectExpr(
        "doc_id",
        "CASE WHEN n_chars % 7 = 0 THEN array()"
        " ELSE transform(sequence(1, 1 + CAST(n_chars % 4 AS INT)),"
        " i -> CAST(doc_id * 10 + i AS BIGINT)) END AS xs",
    )
    return d.select(
        "doc_id", F.explode_outer("xs").alias("x")
    ).select("doc_id", "x", F.col("x").isNull().cast("long").alias("from_empty"))
