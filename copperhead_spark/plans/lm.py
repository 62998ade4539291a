"""N-gram language-model scoring (the CCNet/Gopher quality-signal stage:
score every document by an LM trained on a trusted slice, filter or
bucket by perplexity).  Implemented as a bigram model with add-one
smoothing over the portable token-hash vocabulary — counts, not neural
weights, so training is two aggregations and scoring is two joins, all
expressible on both engines and therefore fully oracle-checked.

Determinism: the only transcendental is LN of a ratio of integers; each
per-bigram log-probability is rounded to 1e-6 fixed point BEFORE the
per-document sum (integer addition is associative, so partition order
cannot change the result).  Engine libms agree on LN to <= 1 ulp
(~1e-16 relative), six orders below the rounding grain — the same
discipline as the HLL estimate (plans/sketches.py).

Scale (100 TB): token/bigram hashing fuses into the scan; the count
tables shuffle distinct-gram cardinality with map-side partial agg;
scoring is two hash joins keyed on the gram — when the trusted training
slice is small (the usual CCNet setup) both count tables fit in a
broadcast and scoring becomes map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.text import token_hashes_duck, token_hashes_spark
from copperhead_spark.operators.barrier import project_once
from copperhead_spark.plans.registry import register

_LM_TRAIN_MOD = 10  # doc_id % 10 < 8 trains the model; every doc is scored
_LM_TRAIN_LT = 8
_PACK = 1 << 21  # token hashes < TOKEN_P (~2^20): h1*2^21 + h2 is injective
_LP_SCALE = 1_000_000


def _bigrams_spark(th: str) -> str:
    """array<bigint> of packed adjacent-token bigrams over hash array."""
    m = f"greatest(size({th}) - 1, 0)"
    return (
        f"zip_with(slice({th}, 1, {m}), slice({th}, 2, {m}),"
        f" (a, b) -> a * CAST({_PACK} AS BIGINT) + b)"
    )


def _bigrams_duck(th: str) -> str:
    return (
        f"list_transform(range(1, len({th})),"
        f" i -> {th}[i] * CAST({_PACK} AS BIGINT) + {th}[i + 1])"
    )


def _lp_e6(c12: str, c1: str, vocab: str) -> str:
    """Fixed-point (1e-6) log P(w2|w1) with add-one smoothing — identical
    text on both engines: integer->double division is IEEE-exact, LN is
    rounded immediately."""
    num = f"CAST({c12} + 1 AS DOUBLE)"
    den = f"CAST({c1} + {vocab} AS DOUBLE)"
    return f"CAST(ROUND(LN({num} / {den}) * {float(_LP_SCALE)!r}) AS BIGINT)"


def _lm_oracle() -> str:
    th = token_hashes_duck("text")
    train = f"doc_id % {_LM_TRAIN_MOD} < {_LM_TRAIN_LT}"
    return f"""
WITH th AS (
  SELECT doc_id, {th} AS th FROM documents
),
big AS (
  SELECT doc_id, unnest({_bigrams_duck("th")}) AS p FROM th
),
c12 AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS c12
  FROM big WHERE {train} GROUP BY p
),
c1 AS (
  SELECT p // {_PACK} AS h1, CAST(COUNT(*) AS BIGINT) AS c1
  FROM big WHERE {train} GROUP BY 1
),
v AS (
  SELECT CAST(COUNT(DISTINCT t.h) AS BIGINT) AS vocab
  FROM th, unnest(th.th) AS t(h)
  WHERE {train}
),
scored AS (
  SELECT b.doc_id,
         {_lp_e6("COALESCE(c12.c12, 0)", "COALESCE(c1.c1, 0)", "v.vocab")} AS lp_e6
  FROM big b
  LEFT JOIN c12 USING (p)
  LEFT JOIN c1 ON c1.h1 = b.p // {_PACK}
  CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(-SUM(lp_e6) AS BIGINT) AS nll_e6,
       CAST(-SUM(lp_e6) AS DOUBLE) / (COUNT(*) * {float(_LP_SCALE)!r}) AS avg_nll
FROM scored GROUP BY doc_id
"""


@register("text_bigram_lm_score", oracle=_lm_oracle(), tags=("text", "lm"))
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM negative log-likelihood per document: the model (bigram
    and left-context counts, add-one smoothing over the token-hash
    vocabulary) trains on the doc_id%{_LM_TRAIN_MOD}<{_LM_TRAIN_LT}
    slice; every document with >= 2 tokens is scored.  avg_nll is the
    per-bigram cross-entropy — the CCNet-style quality/filtering signal.
    The vocabulary size is one scalar, materialized driver-side and
    inlined as a literal (the scalar-subquery pattern of
    sample_domain_mixture: a literal-key broadcast would constant-fold
    into a nested-loop join)."""
    docs = table(spark, sf_dir, "documents")
    # materialize the hashed corpus ONCE: four consumers (bigram counts,
    # context counts, the vocab scalar, and the scoring stream) would
    # each re-evaluate the per-char token-hash fold over the full corpus
    # otherwise.  At 100 TB this is the "tokenize once, persist the
    # token table" layout every LM pipeline uses.
    th = project_once(
        docs,
        "doc_id",
        f"{token_hashes_spark('text')} AS _th",
        f"doc_id % {_LM_TRAIN_MOD} < {_LM_TRAIN_LT} AS _train",
    ).localCheckpoint()
    big = th.selectExpr(
        "doc_id", "_train", f"explode({_bigrams_spark('_th')}) AS p"
    )
    train_big = big.filter("_train")
    c12 = train_big.groupBy("p").agg(F.count("*").cast("long").alias("c12"))
    c1 = (
        train_big.selectExpr(f"p div {_PACK} AS h1")
        .groupBy("h1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    vocab = int(
        th.filter("_train")
        .selectExpr("explode(_th) AS h")
        .agg(F.countDistinct("h"))
        .first()[0]
    )
    scored = (
        big.join(c12, "p", "left")
        .join(c1, F.expr(f"p div {_PACK}") == F.col("h1"), "left")
        .selectExpr(
            "doc_id",
            f"{_lp_e6('COALESCE(c12, 0)', 'COALESCE(c1, 0)', vocab)} AS lp_e6",
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (-F.sum("lp_e6")).cast("long").alias("nll_e6"),
        (
            (-F.sum("lp_e6")).cast("double")
            / (F.count("*") * F.lit(float(_LP_SCALE)))
        ).alias("avg_nll"),
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
