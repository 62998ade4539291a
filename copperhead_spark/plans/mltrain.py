"""Distributed training primitives for quality classifiers (the
fasttext-style linear gate every corpus pipeline trains): the
hashing-trick vectorizer and a full-batch perceptron training loop.

Both are integer-exact end to end — the perceptron update rule with
learning rate 1 over integer features is pure BIGINT arithmetic (no
sigmoid, no float gradient), so the training trajectory itself is
bit-reproducible and oracle-checkable, epoch by epoch.  That is the
point: a deterministic trainer can be audited at 100 TB (re-run a shard,
hash the weights), where float SGD cannot.

Scale shape: each epoch is one map (margin under broadcast weights) +
one partial-aggregated sum of misclassified feature vectors — the
classic Spark ML loop where executors compute gradient partials and the
k-dim weight state lives on the driver (here k=4; a fasttext-width
model broadcasts the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.hashing import mix_sql
from copperhead_spark.functions.text import token_hashes_duck, token_hashes_spark
from copperhead_spark.plans.registry import register

# ---------------------------------------------------------------------------
# feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_BUCKETS = 1024
_FH_SALT = 5


def _fh_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({token_hashes_duck()}) AS th
  FROM documents
),
bc AS (
  SELECT doc_id, {mix_sql("th", _FH_SALT)} % {_FH_BUCKETS} AS bucket,
         COUNT(*) AS c
  FROM tok GROUP BY doc_id, bucket
),
m AS (SELECT *, MAX(c) OVER (PARTITION BY doc_id) AS cmax FROM bc)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(c * c) AS BIGINT) AS l2sq,
       CAST(MIN(CASE WHEN c = cmax THEN bucket END) AS BIGINT) AS top_bucket
FROM m GROUP BY doc_id
"""


@register("text_feature_hashing", oracle=_fh_oracle(), tags=("text", "ml"))
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization: every token maps to one of
    {_FH_BUCKETS} buckets via the portable quadratic-mix hash — the
    fixed-width sparse count vector linear models consume, with no
    vocabulary table to build, ship, or keep consistent (the whole point
    of the trick at corpus scale).  Emits per-doc summary invariants of
    the vector (token mass, support size, squared L2 norm, argmax bucket
    with min-bucket tie-break) rather than 1024 columns; downstream
    consumers take the (doc_id, bucket, c) triplet stream.  Shape: one
    (doc_id, bucket) partial-agg exchange, then a doc_id rollup."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.selectExpr("doc_id", f"explode({token_hashes_spark()}) AS th")
    bc = tok.selectExpr(
        "doc_id", f"{mix_sql('th', _FH_SALT)} % {_FH_BUCKETS} AS bucket"
    ).groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    # argmax bucket via max(struct(c, -bucket)): no second window shuffle
    return bc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("l2sq"),
        (-F.max(F.struct(F.col("c"), (-F.col("bucket")).alias("nb"))).getField("nb"))
        .cast("long")
        .alias("top_bucket"),
    )


# ---------------------------------------------------------------------------
# full-batch perceptron training loop
# ---------------------------------------------------------------------------

_PCT_EPOCHS = 3

# integer features: bias, chars/100, token count, 'e' count; label:
# +1 iff lang = 'en'.  Shared SQL text (identical on both engines).
_PCT_FEATS = (
    "CAST(1 AS BIGINT) AS x0",
    "CAST(n_chars AS BIGINT) / 100 AS x1",
    None,  # x2 differs per dialect (split vs string_split)
    "CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS x3",
    "CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y",
)


def _pct_feats(dialect: str) -> list[str]:
    x2 = (
        "CAST(size(split(text, ' ')) AS BIGINT) AS x2"
        if dialect == "spark"
        else "CAST(len(string_split(text, ' ')) AS BIGINT) AS x2"
    )
    div = "DIV" if dialect == "spark" else "//"
    parts = [p for p in _PCT_FEATS if p is not None]
    parts.insert(2, x2)
    return [p.replace("/ 100", f"{div} 100") for p in parts]


def _pct_oracle() -> str:
    ctes = [f"f AS (SELECT {', '.join(_pct_feats('duck'))} FROM documents)"]
    w = ("CAST(0 AS BIGINT)",) * 4
    rows = []
    for t in range(1, _PCT_EPOCHS + 1):
        margin = f"y * ({w[0]} * x0 + {w[1]} * x1 + {w[2]} * x2 + {w[3]} * x3)"
        ctes.append(
            f"""e{t} AS (
  SELECT COUNT(*) AS n_mis,
         COALESCE(SUM(y * x0), 0) AS g0, COALESCE(SUM(y * x1), 0) AS g1,
         COALESCE(SUM(y * x2), 0) AS g2, COALESCE(SUM(y * x3), 0) AS g3
  FROM f WHERE {margin} <= 0
)"""
        )
        w = tuple(
            f"({w[i]} + (SELECT g{i} FROM e{t}))" for i in range(4)
        )
        rows.append(
            f"SELECT {t} AS epoch, (SELECT n_mis FROM e{t}) AS n_mis,"
            # CAST: SUM of BIGINT is HUGEINT in DuckDB, which pandas
            # materializes as float64 — the driver's value hash would
            # then split from Spark's int64 (the r04 SKE3 failure class)
            f" CAST({w[0]} AS BIGINT) AS w0, CAST({w[1]} AS BIGINT) AS w1,"
            f" CAST({w[2]} AS BIGINT) AS w2, CAST({w[3]} AS BIGINT) AS w3"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


@register(
    "ml_perceptron_train",
    oracle=_pct_oracle(),
    tags=("ml", "iterative"),
)
def ml_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_PCT_EPOCHS}-epoch full-batch perceptron on integer document
    features (label: lang == 'en'): per epoch, rows misclassified under
    the current weights contribute y*x to the update sum; weights live
    on the driver between epochs (collected as ONE 5-long row — the
    spark-ML loop shape, like text_bpe_train_merges' argmax).  Learning
    rate 1 over integer features keeps the entire trajectory in BIGINT:
    the oracle unrolls the identical epochs as CTEs and the weight
    vectors match bit-for-bit.  Returns (epoch, n_mis, w0..w3) after
    each update.  Reference analogue: none (beyond-reference trainer
    beside ml_mlp_inference's scorer)."""
    docs = table(spark, sf_dir, "documents")
    f = docs.selectExpr(*_pct_feats("spark"))
    w = [0, 0, 0, 0]
    out = []
    for t in range(1, _PCT_EPOCHS + 1):
        margin = f"y * ({w[0]} * x0 + {w[1]} * x1 + {w[2]} * x2 + {w[3]} * x3)"
        g = (
            f.filter(F.expr(f"{margin} <= 0"))
            .agg(
                F.count("*").alias("n_mis"),
                *[
                    F.coalesce(F.sum(F.expr(f"y * x{i}")), F.lit(0)).alias(f"g{i}")
                    for i in range(4)
                ],
            )
            .first()
        )
        w = [w[i] + g[f"g{i}"] for i in range(4)]
        out.append((t, g["n_mis"], *w))
    return spark.createDataFrame(
        out, "epoch int, n_mis long, w0 long, w1 long, w2 long, w3 long"
    )


# ---------------------------------------------------------------------------
# closed-form OLS (normal equations from exact fixed-point sums)
# ---------------------------------------------------------------------------


@register(
    "ml_ols_fit",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy_c,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                  * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy_c
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * CAST(sxy_c AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy_c AS DOUBLE))
       / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0) AS slope,
       (CAST(sy_c AS DOUBLE) / 100.0
        - ((CAST(n AS DOUBLE) * CAST(sxy_c AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy_c AS DOUBLE))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
FROM s
""",
    tags=("ml", "regression"),
)
def ml_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least squares (price ~ quantity per return flag) via
    the normal equations over EXACT integer moment sums: Sx, Sy, Sxx,
    Sxy accumulate as fixed-point BIGINTs (order-independent, partial-agg
    friendly — the one shuffle is the tiny per-group moment rollup), and
    only the final slope/intercept division happens in float, an
    identical IEEE expression on both engines.  This is the
    train-on-100TB shape for any GLM solvable by sufficient statistics:
    moments are a map-side-combinable aggregate, the solve is O(groups)
    driver math.  DuckDB's BIGINT SUM widens to HUGEINT, so every sum is
    CAST back before the float stage (the r04 dtype lesson)."""
    li = table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y_c).alias("sy_c"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y_c).alias("sxy_c"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy_c").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy_c").cast("double")
    slope = (nd * sxyd - sxd * syd) / ((nd * sxxd - sxd * sxd) * F.lit(100.0))
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((syd / F.lit(100.0) - slope * sxd) / nd).alias("intercept"),
    )
