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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# multinomial naive Bayes: train on 3/4 of the corpus, classify the rest
# ---------------------------------------------------------------------------

_NB_TOK_DUCK = "unnest(list_filter(string_split(text, ' '), w -> w <> ''))"
_NB_RND = "CAST(ROUND({x} * 1e9) AS BIGINT)"

_NB_ORACLE = f"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
test_docs AS (
  SELECT doc_id, lang AS actual_lang, text FROM documents WHERE doc_id % 4 = 0
),
tok_tr AS (SELECT doc_id, lang, {_NB_TOK_DUCK} AS term FROM train),
cnt AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c FROM tok_tr GROUP BY 1, 2),
vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tok_tr),
ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train),
cls0 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS ndocs FROM train GROUP BY 1),
cls1 AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
cls AS (
  SELECT c0.lang, ndocs, tot,
         {_NB_RND.format(x="LN(CAST(ndocs AS DOUBLE) / n)")} AS prior_e9,
         {_NB_RND.format(x="LN(CAST(1 AS DOUBLE) / (tot + v))")} AS default_e9
  FROM cls0 c0 JOIN cls1 c1 ON c0.lang = c1.lang CROSS JOIN vocab CROSS JOIN ntr
),
w AS (
  SELECT cnt.lang, cnt.term,
         {_NB_RND.format(x="LN((CAST(c AS DOUBLE) + 1) / (tot + v))")}
           - default_e9 AS corr_w
  FROM cnt JOIN cls ON cnt.lang = cls.lang CROSS JOIN vocab
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, {_NB_TOK_DUCK} AS term FROM test_docs) GROUP BY 1, 2
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
base AS (
  SELECT d.doc_id, c.lang, prior_e9 + default_e9 * dl AS base_e9
  FROM dl d CROSS JOIN cls c
),
corr AS (
  SELECT tf.doc_id, w.lang, CAST(SUM(tf * corr_w) AS BIGINT) AS corr_e9
  FROM tf JOIN w ON tf.term = w.term GROUP BY 1, 2
),
score AS (
  SELECT b.doc_id, b.lang, base_e9 + COALESCE(corr_e9, 0) AS score_e9
  FROM base b LEFT JOIN corr ON b.doc_id = corr.doc_id AND b.lang = corr.lang
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score_e9 DESC, lang ASC
  ) AS rn FROM score
)
SELECT r.doc_id, r.lang AS pred_lang, t.actual_lang,
       CAST(r.lang = t.actual_lang AS BIGINT) AS correct, r.score_e9
FROM ranked r JOIN test_docs t ON r.doc_id = t.doc_id
WHERE rn = 1
"""


@register("ml_naive_bayes_classify", oracle=_NB_ORACLE, tags=("ml", "text"))
def ml_naive_bayes_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes, trained and applied in one plan: fit
    Laplace-smoothed per-language token likelihoods on the 3/4 training
    split, score every holdout document against every class, and emit
    the argmax prediction with a correctness flag.

    Exactness: every log-likelihood is rounded through 1e-9 fixed point
    the moment it is born (prior, per-term weight, unseen-term default),
    so scores are BIGINT sums of identically-rounded terms — partial-agg
    reordering cannot change them, and both engines replay the same
    arithmetic.  Unseen terms are folded in algebraically: score =
    prior + default*doc_len + sum(tf * (w - default)) over MATCHED
    terms only, which removes any need to materialize vocab x classes.

    Scale design: the model is two relations — class stats (one row per
    class, broadcast) and term weights (vocab x observed-class rows,
    hash-joined on term against holdout term frequencies: the join a
    100 TB corpus can actually run, since only matched (term, class)
    pairs flow).  Corpus-level integer scalars (V, N) cross the driver
    once — the kmeans/k-rows-per-iteration discipline.  The class-list
    fan-out joins on a constant-valued NON-FOLDABLE key so Catalyst
    compiles a broadcast hash join, never a cartesian.

    Reference analogue: the fold-routed DNN/BDT inference family
    (SURVEY F1/F2) — same train-elsewhere/score-at-scale shape, here
    with training in-plan too."""
    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 4 != 0)
    test = docs.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.col("lang").alias("actual_lang"), "text"
    )
    tok_expr = "explode(filter(split(text, ' '), w -> w != '')) AS term"
    tok_tr = train.selectExpr("doc_id", "lang", tok_expr)
    cnt = tok_tr.groupBy("lang", "term").agg(F.count("*").cast("long").alias("c"))
    # integer corpus scalars: exact on both engines, so safe as literals
    v = tok_tr.select("term").distinct().count()
    n = train.count()
    rnd = "CAST(ROUND({x} * 1e9) AS BIGINT)"
    cls = (
        train.groupBy("lang")
        .agg(F.count("*").cast("long").alias("ndocs"))
        .join(cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("tot")), "lang")
        .selectExpr(
            "lang",
            "tot",
            rnd.format(x=f"LN(CAST(ndocs AS DOUBLE) / {n})") + " AS prior_e9",
            rnd.format(x=f"LN(CAST(1 AS DOUBLE) / (tot + {v}))") + " AS default_e9",
            # non-foldable constant join key for the class fan-out
            "CAST(tot * 0 AS BIGINT) AS k",
        )
    )
    rnd_w = rnd.format(x="LN((CAST(c AS DOUBLE) + 1) / (tot + {v}))")
    weights = (
        cnt.join(F.broadcast(cls.select("lang", "tot", "default_e9")), "lang")
        .selectExpr(
            "lang",
            "term",
            rnd_w.format(v=v) + " - default_e9 AS corr_w",
        )
    )
    tf = test.selectExpr("doc_id", tok_expr).groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    base = dl.selectExpr("doc_id", "dl", "CAST(dl * 0 AS BIGINT) AS k").join(
        F.broadcast(cls.select("lang", "prior_e9", "default_e9", "k")), "k"
    ).selectExpr("doc_id", "lang", "prior_e9 + default_e9 * dl AS base_e9")
    corr = (
        tf.join(weights, "term")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("tf") * F.col("corr_w")).cast("long").alias("corr_e9"))
    )
    score = base.join(corr, ["doc_id", "lang"], "left").selectExpr(
        "doc_id", "lang", "base_e9 + COALESCE(corr_e9, CAST(0 AS BIGINT)) AS score_e9"
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_e9").desc(), F.col("lang").asc())
    pred = score.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return pred.join(test.select("doc_id", "actual_lang"), "doc_id").select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        "actual_lang",
        (F.col("lang") == F.col("actual_lang")).cast("long").alias("correct"),
        "score_e9",
    )


# ---------------------------------------------------------------------------
# decision stump: exact-integer Gini split search
# ---------------------------------------------------------------------------

_STUMP_QMAX = 50


def _sdiv(a: str, b: str) -> str:
    """floor(a * 1e4 / b) without the 1e4 blow-up: (a DIV b)*1e4 +
    ((a % b)*1e4) DIV b — every intermediate stays within ~1e4 * b of
    BIGINT range, so the split score survives corpus sizes where the
    naive a*1e4 product would overflow."""
    return f"(({a}) DIV ({b})) * 10000 + ((({a}) % ({b})) * 10000) DIV ({b})"


def _stump_oracle() -> str:
    sd_l = _sdiv("sq_l", "n_l").replace("DIV", "//")
    sd_r = _sdiv("sq_r", "n_r").replace("DIV", "//")
    return f"""
WITH c AS (
  SELECT CAST(l_quantity AS BIGINT) AS q, l_returnflag AS cls,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
grid AS (
  SELECT g.q, cl.cls FROM
  (SELECT unnest(range(1, {_STUMP_QMAX} + 1)) AS q) g
  CROSS JOIN (SELECT DISTINCT l_returnflag AS cls FROM lineitem) cl
),
cum AS (
  SELECT grid.q, grid.cls,
         CAST(SUM(COALESCE(c.c, 0)) OVER (
           PARTITION BY grid.cls ORDER BY grid.q
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM grid LEFT JOIN c ON grid.q = c.q AND grid.cls = c.cls
),
tot AS (SELECT cls, CAST(SUM(c) AS BIGINT) AS total FROM c GROUP BY 1),
per_t AS (
  SELECT cum.q AS threshold,
         CAST(SUM(cum) AS BIGINT) AS n_l,
         CAST(SUM(cum * cum) AS BIGINT) AS sq_l,
         CAST(SUM(total - cum) AS BIGINT) AS n_r,
         CAST(SUM((total - cum) * (total - cum)) AS BIGINT) AS sq_r
  FROM cum JOIN tot ON cum.cls = tot.cls
  GROUP BY 1
),
scored AS (
  SELECT threshold, n_l, n_r,
         CAST({sd_l} + {sd_r} AS BIGINT) AS purity_e4
  FROM per_t WHERE n_l > 0 AND n_r > 0
)
SELECT threshold, n_l, n_r, purity_e4, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY purity_e4 DESC, threshold ASC) AS rn
  FROM scored
)
"""


@register("ml_decision_stump", oracle=_stump_oracle(), tags=("ml",))
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training: exhaustive best-split search over the
    quantity feature for the 3-class return-flag label, scored by the
    Gini-equivalent purity sum(count_class^2)/n on each side (maximizing
    it minimizes weighted Gini impurity).  All candidate thresholds are
    returned ranked, so the fitted stump is rank 1 and the full split
    profile is value-checked.

    Exactness: class counts are exact integers; the only division is
    floor(sq/n * 1e4), computed by the overflow-safe decomposition
    (a DIV b)*1e4 + ((a%b)*1e4) DIV b so scores stay in BIGINT at any
    corpus size where per-side counts fit.

    Scale design: ONE partial-agg shuffle compresses the 100 TB fact
    table to |feature values| x |classes| cells; everything after —
    dense grid fan-out (constant-key broadcast), cumulative windows
    (partitioned by class over {_STUMP_QMAX} rows), threshold scoring —
    is metadata-sized.  This histogram-then-search shape is exactly how
    distributed GBDT (LightGBM/XGBoost-style) finds splits.

    Reference analogue: the BDT inference operator (F2) — this is the
    missing train half of a one-level tree, built on the same exact
    counting machinery."""
    li = table(spark, sf_dir, "lineitem")
    c = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS q", "l_returnflag AS cls"
    ).groupBy("q", "cls").agg(F.count("*").cast("long").alias("c"))
    classes = li.select(F.col("l_returnflag").alias("cls")).distinct()
    grid = classes.selectExpr(
        "cls", f"explode(sequence(1, {_STUMP_QMAX})) AS q"
    ).select("q", "cls")
    cum = (
        grid.join(c, ["q", "cls"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
        .withColumn(
            "cum",
            F.sum("c")
            .over(
                Window.partitionBy("cls")
                .orderBy("q")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("long"),
        )
    )
    tot = c.groupBy("cls").agg(F.sum("c").cast("long").alias("total"))
    per_t = (
        cum.join(F.broadcast(tot), "cls")
        .groupBy(F.col("q").alias("threshold"))
        .agg(
            F.sum("cum").cast("long").alias("n_l"),
            F.sum(F.col("cum") * F.col("cum")).cast("long").alias("sq_l"),
            F.sum(F.col("total") - F.col("cum")).cast("long").alias("n_r"),
            F.sum((F.col("total") - F.col("cum")) * (F.col("total") - F.col("cum")))
            .cast("long")
            .alias("sq_r"),
        )
    )
    scored = per_t.filter((F.col("n_l") > 0) & (F.col("n_r") > 0)).selectExpr(
        "threshold",
        "n_l",
        "n_r",
        f"CAST({_sdiv('sq_l', 'n_l')} + {_sdiv('sq_r', 'n_r')} AS BIGINT) AS purity_e4",
    )
    w = Window.orderBy(F.col("purity_e4").desc(), F.col("threshold").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# exact ROC AUC by rank-sum (Mann-Whitney U)
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH s AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score,
         CAST(o_orderstatus = 'F' AS BIGINT) AS y
  FROM orders
),
r AS (
  SELECT grp, score, y,
         CAST(RANK() OVER (PARTITION BY grp ORDER BY score ASC) AS BIGINT) AS r_asc,
         CAST(RANK() OVER (PARTITION BY grp ORDER BY score DESC) AS BIGINT) AS r_desc,
         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM s
),
g AS (
  SELECT grp, MIN(n) AS n,
         CAST(SUM(y) AS BIGINT) AS npos,
         MIN(n) - CAST(SUM(y) AS BIGINT) AS nneg,
         CAST(SUM(CASE WHEN y = 1 THEN r_asc + n + 1 - r_desc ELSE 0 END) AS BIGINT)
           AS sumrank2_pos
  FROM r GROUP BY grp
),
u AS (
  SELECT grp, n, npos, nneg,
         sumrank2_pos - npos * (npos + 1) AS u2
  FROM g WHERE npos > 0 AND nneg > 0
)
SELECT grp, n, npos, nneg,
       CAST((u2 // (2 * npos * nneg)) * 1000000
            + ((u2 % (2 * npos * nneg)) * 1000000) // (2 * npos * nneg)
         AS BIGINT) AS auc_e6
FROM u ORDER BY grp
"""


@register("ml_auc_rank", oracle=_AUC_ORACLE, tags=("ml", "evaluation"))
def ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC per group via the rank-sum (Mann-Whitney U)
    identity: AUC = (sum of positive ranks - npos(npos+1)/2) / (npos *
    nneg), with the tie-correct average rank obtained WITHOUT fractions
    as 2*avgrank = rank_asc + (n + 1 - rank_desc).  Everything up to the
    final 1e-6 fixed-point division is BIGINT, and that division uses
    the overflow-safe (a DIV b)*1e6 + ((a%b)*1e6) DIV b decomposition —
    so the AUC is bit-reproducible, unlike threshold-sweep AUCs whose
    float trapezoids depend on partition order.

    Scale design: AUC-by-rank is the distributed evaluation pattern —
    two per-group sort windows (hash exchange on the group key, sorts
    run per partition) and one partial aggregation; nothing quadratic,
    no threshold grid.  A single global AUC over 10^12 rows would swap
    the full sort for the binned-score histogram (see
    sketch_binned_quantiles) — the per-group form here IS the model-
    selection report shape (AUC per segment).  U2 reaches npos*n, so
    beyond ~3e9 rows/group promote the two rank sums to DECIMAL(38,0).

    Reference analogue: extends the evaluation side of the DNN/BDT
    scoring operators (F1/F2) — the reference scores events but defers
    metrics to offline tools; here the metric is in-engine."""
    o = table(spark, sf_dir, "orders")
    s = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    wg = Window.partitionBy("grp")
    r = s.select(
        "grp",
        "y",
        F.rank().over(wg.orderBy(F.col("score").asc())).cast("long").alias("r_asc"),
        F.rank().over(wg.orderBy(F.col("score").desc())).cast("long").alias("r_desc"),
        F.count("*").over(wg).cast("long").alias("n"),
    )
    g = r.groupBy("grp").agg(
        F.min("n").alias("n"),
        F.sum("y").cast("long").alias("npos"),
        (F.min("n") - F.sum("y")).cast("long").alias("nneg"),
        F.sum(
            F.when(F.col("y") == 1, F.col("r_asc") + F.col("n") + 1 - F.col("r_desc"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("sumrank2_pos"),
    )
    u = g.filter((F.col("npos") > 0) & (F.col("nneg") > 0)).withColumn(
        "u2", F.col("sumrank2_pos") - F.col("npos") * (F.col("npos") + 1)
    )
    return u.selectExpr(
        "grp",
        "n",
        "npos",
        "nneg",
        "CAST((u2 DIV (2 * npos * nneg)) * 1000000"
        " + ((u2 % (2 * npos * nneg)) * 1000000) DIV (2 * npos * nneg)"
        " AS BIGINT) AS auc_e6",
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# leave-one-out target encoding
# ---------------------------------------------------------------------------

_TE_ORACLE = """
WITH f AS (
  SELECT l_suppkey AS cat, CAST(l_returnflag = 'R' AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT cat, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
  FROM f GROUP BY cat
),
pairs AS (SELECT DISTINCT cat, y FROM f)
SELECT p.cat, p.y, g.n, g.s,
       CAST(CASE WHEN g.n > 1
            THEN ((g.s - p.y) * 1000000000) // (g.n - 1) ELSE -1 END AS BIGINT)
         AS enc_loo_e9,
       CAST(((g.s - p.y + 1) * 1000000000) // (g.n - 1 + 2) AS BIGINT)
         AS enc_smooth_e9
FROM pairs p JOIN g ON p.cat = g.cat
ORDER BY p.cat, p.y
"""


@register("ml_target_encode_loo", oracle=_TE_ORACLE, tags=("ml", "features"))
def ml_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature (supplier)
    against a binary target (returned lineitem): each row's encoding
    excludes its own label, enc = (sum_cat - y_own) / (n_cat - 1), the
    standard leakage guard for tree/GBM features.  Because the LOO value
    depends only on (category, own label), the entire encoding is the
    compact distinct-(cat, y) feature MAP emitted here — exact 1e-9
    fixed point, plus the Laplace-smoothed variant (+1 / +2 pseudo-
    counts) that regularizes rare categories.

    Scale design: one partial-agg shuffle compresses the 100 TB fact
    table to |categories| rows of (n, sum); the encode-back onto every
    training row is then a broadcast map-side join that never shuffles
    the fact table — emitted here as the persistable feature map (at
    most 2 rows per category).  No window over the fact table, no
    per-row state.

    Reference analogue: the b-tag SF lookup-and-apply shape (J10) with
    the lookup table LEARNED from the data instead of loaded."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_suppkey").alias("cat"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    g = f.groupBy("cat").agg(
        F.count("*").cast("long").alias("n"), F.sum("y").cast("long").alias("s")
    )
    pairs = f.distinct()
    return (
        pairs.join(F.broadcast(g), "cat")
        .selectExpr(
            "cat",
            "y",
            "n",
            "s",
            "CAST(CASE WHEN n > 1 THEN ((s - y) * 1000000000) DIV (n - 1)"
            " ELSE -1 END AS BIGINT) AS enc_loo_e9",
            "CAST(((s - y + 1) * 1000000000) DIV (n - 1 + 2) AS BIGINT)"
            " AS enc_smooth_e9",
        )
        .orderBy("cat", "y")
    )


# ---------------------------------------------------------------------------
# closed-form ridge regression (2 features, normal equations, 128-bit)
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1_000_000


def _ridge_beta(num: str, det: str, dialect: str) -> str:
    """sign-split floor((num * 1e9) / det): nonneg operands per branch so
    integer division is engine-portable; runs on DECIMAL(38,0)/HUGEINT."""
    div = "DIV" if dialect == "spark" else "//"
    return (
        f"CASE WHEN {num} >= 0 THEN ({num} * 1000000000) {div} ({det})"
        f" ELSE -((-({num}) * 1000000000) {div} ({det})) END"
    )


def _ridge_oracle() -> str:
    b1 = _ridge_beta("num1", "det", "duck")
    b2 = _ridge_beta("num2", "det", "duck")
    return f"""
WITH f AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1 * x1) AS BIGINT) AS a11,
         CAST(SUM(x1 * x2) AS BIGINT) AS a12,
         CAST(SUM(x2 * x2) AS BIGINT) AS a22,
         CAST(SUM(x1 * y) AS BIGINT) AS b1,
         CAST(SUM(x2 * y) AS BIGINT) AS b2
  FROM f
),
d AS (
  SELECT n, a11, a12, a22, b1, b2,
         (CAST(a11 AS HUGEINT) + {_RIDGE_LAMBDA})
           * (CAST(a22 AS HUGEINT) + {_RIDGE_LAMBDA})
           - CAST(a12 AS HUGEINT) * a12 AS det,
         (CAST(a22 AS HUGEINT) + {_RIDGE_LAMBDA}) * b1
           - CAST(a12 AS HUGEINT) * b2 AS num1,
         (CAST(a11 AS HUGEINT) + {_RIDGE_LAMBDA}) * b2
           - CAST(a12 AS HUGEINT) * b1 AS num2
  FROM m
)
SELECT n, a11, a12, a22, b1, b2,
       CAST({b1} AS BIGINT) AS beta1_e9,
       CAST({b2} AS BIGINT) AS beta2_e9
FROM d
"""


@register("ml_ridge_fit", oracle=_ridge_oracle(), tags=("ml",))
def ml_ridge_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (two features, no intercept): solve
    (X'X + lambda*I) beta = X'y by Cramer's rule on exact BIGINT moment
    sums, with the determinant/numerator products promoted to
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and the final 1e-9
    fixed-point division sign-split so floor == truncation on both
    engines.  The regularizer is what the plain OLS operator
    (ml_ols_fit) lacks: it keeps the solve well-posed under collinear
    features.

    Scale design: identical to the OLS/a14 envelope — ONE partial-agg
    shuffle reduces the fact table to six moment longs; the solve is a
    single-row expression.  This is how closed-form linear models train
    at 100 TB: the data pass is moment accumulation, the algebra is
    metadata.  (k features need k^2/2 moments — same pass, wider row.)

    Reference analogue: ml_ols_fit's J9-style exact-moment discipline
    with regularization added."""
    li = table(spark, sf_dir, "lineitem")
    f = li.selectExpr(
        "CAST(ROUND(l_quantity) AS BIGINT) AS x1",
        "CAST(ROUND(l_discount * 100) AS BIGINT) AS x2",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y",
    )
    m = f.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("x1 * x1")).cast("long").alias("a11"),
        F.sum(F.expr("x1 * x2")).cast("long").alias("a12"),
        F.sum(F.expr("x2 * x2")).cast("long").alias("a22"),
        F.sum(F.expr("x1 * y")).cast("long").alias("b1"),
        F.sum(F.expr("x2 * y")).cast("long").alias("b2"),
    )
    d = m.selectExpr(
        "n",
        "a11",
        "a12",
        "a22",
        "b1",
        "b2",
        f"(CAST(a11 AS DECIMAL(38,0)) + {_RIDGE_LAMBDA})"
        f" * (CAST(a22 AS DECIMAL(38,0)) + {_RIDGE_LAMBDA})"
        " - CAST(a12 AS DECIMAL(38,0)) * a12 AS det",
        f"(CAST(a22 AS DECIMAL(38,0)) + {_RIDGE_LAMBDA}) * b1"
        " - CAST(a12 AS DECIMAL(38,0)) * b2 AS num1",
        f"(CAST(a11 AS DECIMAL(38,0)) + {_RIDGE_LAMBDA}) * b2"
        " - CAST(a12 AS DECIMAL(38,0)) * b1 AS num2",
    )
    return d.selectExpr(
        "n",
        "a11",
        "a12",
        "a22",
        "b1",
        "b2",
        f"CAST({_ridge_beta('num1', 'det', 'spark')} AS BIGINT) AS beta1_e9",
        f"CAST({_ridge_beta('num2', 'det', 'spark')} AS BIGINT) AS beta2_e9",
    )


# ---------------------------------------------------------------------------
# deterministic negative sampling (contrastive-training data prep):
# for each anchor vector, probe a fixed hash sequence of candidate ids
# and keep the first 3 with a DIFFERENT label — reproducible negatives
# with no RNG state, stable under partitioning and reruns.
# ---------------------------------------------------------------------------

_NEG_PROBES = 8
_NEG_KEEP = 3
_NEG_A = 2654435761  # Knuth multiplicative hash constant
_NEG_B = 40503


@register(
    "ml_negative_sampling",
    oracle=f"""
WITH c AS (
  SELECT e.vec_id, e.label AS a_label, t.j,
         (e.vec_id * {_NEG_A} + t.j * {_NEG_B})
           % (SELECT COUNT(*) FROM embeddings) AS cand
  FROM embeddings e,
       LATERAL (SELECT unnest(range(1, {_NEG_PROBES + 1})) AS j) t
),
f AS (
  SELECT c.vec_id, c.cand, b.label AS neg_label,
         ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY c.j) AS rn
  FROM c JOIN embeddings b ON b.vec_id = c.cand
  WHERE b.label <> c.a_label AND c.cand <> c.vec_id
)
SELECT vec_id, CAST(rn AS BIGINT) AS neg_rank,
       CAST(cand AS BIGINT) AS neg_id,
       CAST(neg_label AS BIGINT) AS neg_label
FROM f WHERE rn <= {_NEG_KEEP}
""",
    tags=("ml", "training", "sampling"),
)
def ml_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative mining: each anchor probes
    {_NEG_PROBES} candidate ids from a multiplicative-hash sequence
    (vec_id * {_NEG_A} + j * {_NEG_B} mod n), labels resolve through one
    equi-join, same-label and self hits are rejected, and the first
    {_NEG_KEEP} survivors (probe order) are the anchor's negatives —
    the standard contrastive-pairs prep, made a pure function of the
    data so the training set is auditable and re-creatable.

    Scale: the candidate explode is map-side (x{_NEG_PROBES}); the label
    resolve is ONE shuffle equi-join on candidate id (or a broadcast of
    the (id, label) projection when labels fit); the per-anchor rank
    partitions by anchor — bounded at {_NEG_PROBES} rows each.  The
    corpus-size scalar is one bounded driver literal (the documented
    scalar-subquery pattern)."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    cands = emb.selectExpr(
        "vec_id",
        "label AS a_label",
        f"posexplode(transform(sequence(1, {_NEG_PROBES}),"
        f" j -> (vec_id * {_NEG_A} + j * {_NEG_B}) % {n})) AS (j, cand)",
    )
    labels = emb.select(
        F.col("vec_id").alias("cand"), F.col("label").alias("neg_label")
    )
    f = (
        cands.join(labels, "cand")
        .filter(
            (F.col("neg_label") != F.col("a_label"))
            & (F.col("cand") != F.col("vec_id"))
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("j")
            ),
        )
        .filter(F.col("rn") <= _NEG_KEEP)
    )
    return f.select(
        "vec_id",
        F.col("rn").cast("long").alias("neg_rank"),
        F.col("cand").cast("long").alias("neg_id"),
        F.col("neg_label").cast("long").alias("neg_label"),
    )

# ---------------------------------------------------------------------------
# KS statistic and average precision over a BINNED score: the two
# companion metrics to ml_auc_rank, computed from per-bin integer counts
# so the 100 TB eval set crosses the wire as |distinct scores| rows and
# every number is bit-reproducible (the binned-score histogram is the
# same scale pattern the AUC docstring prescribes for global metrics).
# ---------------------------------------------------------------------------

# overflow-safe fixed-point division: (a DIV b)*m + ((a MOD b)*m) DIV b;
# integer division spells `//` in DuckDB and `DIV` in Spark SQL
def _fpdiv(a: str, b: str, m: int, idiv: str = "//") -> str:
    return (
        f"(({a}) {idiv} ({b})) * {m}"
        f" + ((({a}) % ({b})) * {m}) {idiv} ({b})"
    )


_KS_ORACLE = f"""
WITH s AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS score,
         CAST(l_returnflag = 'R' AS BIGINT) AS y
  FROM lineitem
),
b AS (
  SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
  FROM s GROUP BY score
),
c AS (
  SELECT score,
         CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cpos,
         CAST(SUM(neg) OVER (ORDER BY score) AS BIGINT) AS cneg,
         CAST(SUM(pos) OVER () AS BIGINT) AS npos,
         CAST(SUM(neg) OVER () AS BIGINT) AS nneg
  FROM b
),
d AS (
  SELECT score, npos, nneg,
         ABS(cpos * nneg - cneg * npos) AS gap_num
  FROM c
)
SELECT MIN(npos) + MIN(nneg) AS n, MIN(npos) AS npos, MIN(nneg) AS nneg,
       CAST({_fpdiv("MAX(gap_num)", "MIN(npos) * MIN(nneg)", 1_000_000)}
            AS BIGINT) AS ks_e6,
       MIN(CASE WHEN gap_num = (SELECT MAX(gap_num) FROM d) THEN score END)
         AS ks_threshold
FROM d
"""


@register("ml_ks_statistic", oracle=_KS_ORACLE, tags=("ml", "evaluation"))
def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kolmogorov-Smirnov separation of a binned score (discount
    cents vs 'was returned'): max over thresholds of |CDF_pos - CDF_neg|,
    computed as the INTEGER max of |cpos*nneg - cneg*npos| over the
    per-score cumulative counts, fixed-point-divided by npos*nneg at 1e-6
    (the ml_auc_rank overflow-safe decomposition) — plus the argmax
    threshold (min score on ties).  One partial-agg groupBy on the score
    bin, then windows over |bins| rows: the classic two-sample test at
    any scale, because the cumulative walk happens on the histogram, not
    the rows."""
    li = table(spark, sf_dir, "lineitem")
    b = (
        li.selectExpr(
            "CAST(ROUND(l_discount * 100) AS BIGINT) AS score",
            "CAST(l_returnflag = 'R' AS BIGINT) AS y",
        )
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            (F.count("*") - F.sum("y")).cast("long").alias("neg"),
        )
    )
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = b.select(
        "score",
        F.sum("pos").over(wa).cast("long").alias("npos"),
        F.sum("neg").over(wa).cast("long").alias("nneg"),
        F.abs(
            F.sum("pos").over(wc) * F.sum("neg").over(wa)
            - F.sum("neg").over(wc) * F.sum("pos").over(wa)
        )
        .cast("long")
        .alias("gap_num"),
    )
    mx = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d2 = d.withColumn("max_gap", F.max("gap_num").over(mx))
    return d2.agg(
        (F.min("npos") + F.min("nneg")).alias("n"),
        F.min("npos").alias("npos"),
        F.min("nneg").alias("nneg"),
        F.expr(
            f"CAST({_fpdiv('MAX(gap_num)', 'MIN(npos) * MIN(nneg)', 1_000_000, 'DIV')}"
            " AS BIGINT)"
        ).alias("ks_e6"),
        F.min(
            F.when(F.col("gap_num") == F.col("max_gap"), F.col("score"))
        ).alias("ks_threshold"),
    )


_PR_ORACLE = f"""
WITH s AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS score,
         CAST(l_returnflag = 'R' AS BIGINT) AS y
  FROM lineitem
),
b AS (
  SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM s GROUP BY score
),
c AS (  -- descending score: each bin's cumulative tp and predicted-pos
  SELECT pos AS dtp,
         CAST(SUM(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
         CAST(SUM(cnt) OVER (ORDER BY score DESC) AS BIGINT) AS pp,
         CAST(SUM(pos) OVER () AS BIGINT) AS npos,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM b
),
t AS (
  SELECT npos, n,
         CAST({_fpdiv("dtp * tp", "pp", 1_000_000_000)} AS BIGINT) AS term_e9
  FROM c
)
SELECT MIN(n) AS n, MIN(npos) AS npos,
       CAST({_fpdiv("SUM(term_e9)", "MIN(npos)", 1)} AS BIGINT) AS ap_e9
FROM t
"""


@register("ml_pr_auc", oracle=_PR_ORACLE, tags=("ml", "evaluation"))
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (step-interpolated PR-AUC) of the binned
    score: bins walked in DESCENDING score order, AP = sum_g
    dTP_g * precision_g / TP_total with precision_g = TP_g / PP_g — every
    term an integer floor division at 1e-9 via the overflow-safe
    decomposition, so the metric is a deterministic integer function of
    the per-bin counts (the documented exact convention; both engines
    evaluate the identical formula).  Same scale shape as
    ml_ks_statistic: one histogram groupBy, windows over |bins| rows."""
    li = table(spark, sf_dir, "lineitem")
    b = (
        li.selectExpr(
            "CAST(ROUND(l_discount * 100) AS BIGINT) AS score",
            "CAST(l_returnflag = 'R' AS BIGINT) AS y",
        )
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    wd = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = b.select(
        F.col("pos").alias("dtp"),
        F.sum("pos").over(wd).cast("long").alias("tp"),
        F.sum("cnt").over(wd).cast("long").alias("pp"),
        F.sum("pos").over(wa).cast("long").alias("npos"),
        F.sum("cnt").over(wa).cast("long").alias("n"),
    )
    t = c.selectExpr(
        "npos",
        "n",
        f"CAST({_fpdiv('dtp * tp', 'pp', 1_000_000_000, 'DIV')} AS BIGINT) AS term_e9",
    )
    return t.agg(
        F.min("n").alias("n"),
        F.min("npos").alias("npos"),
        F.expr(
            f"CAST({_fpdiv('SUM(term_e9)', 'MIN(npos)', 1, 'DIV')} AS BIGINT)"
        ).alias("ap_e9"),
    )


_LIFT_ORACLE = f"""
WITH s AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS score,
         CAST(l_returnflag = 'R' AS BIGINT) AS y
  FROM lineitem
),
b AS (
  SELECT score, CAST(SUM(y) AS BIGINT) AS pos, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM s GROUP BY score
),
c AS (
  SELECT score, pos, cnt,
         CAST(SUM(pos) OVER (ORDER BY score DESC) AS BIGINT) AS ctp,
         CAST(SUM(cnt) OVER (ORDER BY score DESC) AS BIGINT) AS cpp,
         CAST(SUM(pos) OVER () AS BIGINT) AS npos,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM b
)
SELECT score, pos, cnt, ctp, cpp,
       CAST({_fpdiv("ctp * 1000000", "npos", 1)} AS BIGINT) AS recall_e6,
       CAST({_fpdiv("cpp * 1000000", "n", 1)} AS BIGINT) AS pop_share_e6,
       CAST({_fpdiv("ctp * n", "cpp * npos", 1_000_000)} AS BIGINT) AS lift_e6
FROM c
"""


@register("ml_lift_gains_table", oracle=_LIFT_ORACLE, tags=("ml", "evaluation"))
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table of the binned score: targeting the
    top-k score bins captures recall_e6 of the positives using
    pop_share_e6 of the population, at lift_e6 = recall/share — the
    campaign-targeting readout beside KS and average precision, every
    number an exact integer function of the per-bin counts (overflow-
    safe fixed-point division throughout; ctp*n <= n^2, so promote to
    DECIMAL past ~3e9 rows).  Same scale shape as ml_ks_statistic: one
    histogram groupBy, windows over |bins| rows."""
    li = table(spark, sf_dir, "lineitem")
    b = (
        li.selectExpr(
            "CAST(ROUND(l_discount * 100) AS BIGINT) AS score",
            "CAST(l_returnflag = 'R' AS BIGINT) AS y",
        )
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    wd = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = b.select(
        "score",
        "pos",
        "cnt",
        F.sum("pos").over(wd).cast("long").alias("ctp"),
        F.sum("cnt").over(wd).cast("long").alias("cpp"),
        F.sum("pos").over(wa).cast("long").alias("npos"),
        F.sum("cnt").over(wa).cast("long").alias("n"),
    )
    return c.selectExpr(
        "score", "pos", "cnt", "ctp", "cpp",
        f"CAST({_fpdiv('ctp * 1000000', 'npos', 1, 'DIV')} AS BIGINT) AS recall_e6",
        f"CAST({_fpdiv('cpp * 1000000', 'n', 1, 'DIV')} AS BIGINT) AS pop_share_e6",
        f"CAST({_fpdiv('ctp * n', 'cpp * npos', 1_000_000, 'DIV')} AS BIGINT) AS lift_e6",
    )


# ---------------------------------------------------------------------------
# logistic regression via IRLS (Newton-Raphson), 2 steps: the iterative
# trainer missing from the perceptron/OLS/NB/stump family.  Every data
# pass reduces to five BIGINT fixed-point sufficient statistics (the
# OLS/ridge recipe), so cross-engine parity is exact: step 0's weights
# are closed-form (beta=0 -> p=0.5 -> w=1/4, no libm anywhere), step 1's
# per-row sigmoid goes through the same ROUND(x*1e6) absorption the
# MLP/GBDT oracles use, and the Newton solve itself is pure IEEE double
# arithmetic over identical integers with identical expression shape on
# both engines (driver python mirrors the oracle's CTE text op-for-op).
# ---------------------------------------------------------------------------

_LOGREG_X = "CAST(l_discount * 10 AS DOUBLE)"
_LOGREG_Y = "CASE WHEN l_returnflag = 'R' THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"

# Newton update from scaled stats (the 1e6 scales cancel in H^-1 g):
#   [b0,b1] += [[s0,s1],[s1,s2]]^-1 [g0,g1]
_LOGREG_SOLVE = """
  b0 + (CAST(s2 AS DOUBLE) * CAST(g0 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(g1 AS DOUBLE))
       / (CAST(s0 AS DOUBLE) * CAST(s2 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS b0,
  b1 + (CAST(s0 AS DOUBLE) * CAST(g1 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(g0 AS DOUBLE))
       / (CAST(s0 AS DOUBLE) * CAST(s2 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS b1
"""

_LOGREG_ORACLE = f"""
WITH d AS (
  SELECT {_LOGREG_X} AS x, {_LOGREG_Y} AS y FROM lineitem
),
st0 AS (
  SELECT COUNT(*) * 250000 AS s0,
         SUM(CAST(ROUND(0.25e0 * x * 1e6) AS BIGINT)) AS s1,
         SUM(CAST(ROUND(0.25e0 * x * x * 1e6) AS BIGINT)) AS s2,
         SUM(CAST(ROUND((y - 0.5e0) * 1e6) AS BIGINT)) AS g0,
         SUM(CAST(ROUND((y - 0.5e0) * x * 1e6) AS BIGINT)) AS g1,
         CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1
  FROM d
),
beta1 AS (SELECT {_LOGREG_SOLVE} FROM st0),
p1 AS (
  SELECT d.y, d.x,
         CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + EXP(-(b.b0 + b.b1 * d.x))) AS p,
         b.b0, b.b1
  FROM d, beta1 b
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
beta2 AS (SELECT {_LOGREG_SOLVE} FROM st1)
SELECT (SELECT COUNT(*) FROM d) AS n,
       CAST(ROUND(b0 * 1e9) AS BIGINT) / 1e9 AS b0,
       CAST(ROUND(b1 * 1e9) AS BIGINT) / 1e9 AS b1
FROM beta2
"""


def _logreg_solve_py(b0, b1, s0, s1, s2, g0, g1):
    """Driver-side twin of _LOGREG_SOLVE: same casts, same operation
    order, so the doubles are bit-identical to the oracle's CTE."""
    den = float(s0) * float(s2) - float(s1) * float(s1)
    return (
        b0 + (float(s2) * float(g0) - float(s1) * float(g1)) / den,
        b1 + (float(s0) * float(g1) - float(s1) * float(g0)) / den,
    )


@register("ml_logreg_irls", oracle=_LOGREG_ORACLE, tags=("ml", "iterative"))
def ml_logreg_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression (intercept + one feature: does discount
    predict returns?) trained by TWO Newton/IRLS steps.  Each step is
    one map-side partial-agg pass producing five BIGINT fixed-point
    sufficient statistics; the driver sees 5 scalars per step (the
    HITS-half-step precedent) and the 2x2 Newton solve is driver
    arithmetic mirroring the oracle bit-for-bit.  Step 0 is libm-free
    (beta=0 gives w=1/4 exactly); step 1's sigmoid is absorbed by the
    ROUND(.*1e6) recipe.  Scale: per iteration the 100 TB table crosses
    the wire as five BIGINTs — the textbook distributed-GLM shape
    (Spark MLlib's own LogisticRegression aggregates gradients the same
    way); k more features cost a (k+1)^2 stat matrix, not a shuffle."""
    li = table(spark, sf_dir, "lineitem")
    d = li.selectExpr(f"{_LOGREG_X} AS x", f"{_LOGREG_Y} AS y")
    st0 = d.selectExpr(
        "COUNT(*) * 250000 AS s0",
        "SUM(CAST(ROUND(0.25e0 * x * 1e6) AS BIGINT)) AS s1",
        "SUM(CAST(ROUND(0.25e0 * x * x * 1e6) AS BIGINT)) AS s2",
        "SUM(CAST(ROUND((y - 0.5e0) * 1e6) AS BIGINT)) AS g0",
        "SUM(CAST(ROUND((y - 0.5e0) * x * 1e6) AS BIGINT)) AS g1",
        "COUNT(*) AS n",
    ).first()
    b0, b1 = _logreg_solve_py(
        0.0, 0.0, st0.s0, st0.s1, st0.s2, st0.g0, st0.g1
    )
    # step 1: beta enters as double literals (F.lit keeps the exact bits)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b0) + F.lit(b1) * F.col("x"))))
    w = p * (F.lit(1.0) - p)
    st1 = d.agg(
        F.sum(F.round(w * 1e6).cast("long")).alias("s0"),
        F.sum(F.round(w * F.col("x") * 1e6).cast("long")).alias("s1"),
        F.sum(F.round(w * F.col("x") * F.col("x") * 1e6).cast("long")).alias("s2"),
        F.sum(F.round((F.col("y") - p) * 1e6).cast("long")).alias("g0"),
        F.sum(F.round((F.col("y") - p) * F.col("x") * 1e6).cast("long")).alias("g1"),
    ).first()
    b0, b1 = _logreg_solve_py(b0, b1, st1.s0, st1.s1, st1.s2, st1.g0, st1.g1)
    return spark.range(1).selectExpr(
        f"CAST({st0.n} AS BIGINT) AS n",
        f"CAST(ROUND(CAST({b0!r} AS DOUBLE) * 1e9) AS BIGINT) / 1e9 AS b0",
        f"CAST(ROUND(CAST({b1!r} AS DOUBLE) * 1e9) AS BIGINT) / 1e9 AS b1",
    )


from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
