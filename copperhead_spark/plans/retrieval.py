"""Lexical retrieval over the documents corpus: BM25 scoring + top-k.

Beyond-reference capability (LLM-training-data pipeline): corpus-level
relevance ranking is the workhorse of data curation — scoring every
document against a query/topic filter ("find textbook-like pages") and
keeping the top slice.  BM25 is the standard lexical scorer.

Scale design (100 TB corpus):
- tf/dl are per-row array expressions on the token array — map-only,
  no explode, no shuffle of the corpus.
- df/avgdl are ONE global aggregate row (bytes, not rows) — partial
  aggregation map-side, a single-row exchange, then broadcast back via
  cross join (BroadcastNestedLoopJoin over 1 row = free).
- top-k compiles to TakeOrderedAndProject: per-partition heaps merged
  on the driver — no global sort.
- the corpus is scanned exactly twice (stats pass + scoring pass); at
  scale the stats row is tiny enough to cache/reuse across queries.

BM25's idf is a transcendental (LN) — only ulp-accurate per libm — so
the final score is rounded through fixed point at 1e-9 (the established
pattern, functions/exact.py) where a few-ulp wobble cannot flip the
value; ordering ties are broken by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.plans.registry import register

_TERMS = ("spark", "window", "merge")
_K1 = 1.2
_B = 0.75
_TOPN = 25


def _tf_expr(i: int, engine: str) -> str:
    """Per-doc term frequency from the token array (identical math, per-
    engine HOF spelling)."""
    t = _TERMS[i]
    if engine == "spark":
        return f"CAST(size(filter(toks, w -> w = '{t}')) AS BIGINT)"
    return f"CAST(len(list_filter(toks, w -> w = '{t}')) AS BIGINT)"


def _score_sql() -> str:
    """BM25 score as one expression over tf_i/df_i/dl/avgdl — the same
    text runs on both engines (only +,*,/ and LN; LN wobble absorbed by
    the final fixed-point rounding)."""
    terms = []
    for i in range(len(_TERMS)):
        idf = (
            f"LN((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        tfn = (
            f"(CAST(tf_{i} AS DOUBLE) * {_K1 + 1.0})"
            f" / (CAST(tf_{i} AS DOUBLE) + {_K1} * (1.0 - {_B}"
            f" + {_B} * CAST(dl AS DOUBLE) / avgdl))"
        )
        terms.append(f"({idf}) * ({tfn})")
    raw = " + ".join(terms)
    return f"CAST(ROUND(({raw}) * 1e9) AS BIGINT) / 1e9"


def _bm25_oracle() -> str:
    tfs = ", ".join(f"{_tf_expr(i, 'duck')} AS tf_{i}" for i in range(len(_TERMS)))
    dfs = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(_TERMS))
    )
    return f"""
WITH d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tfs}
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         {dfs}
  FROM d
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, bm25
FROM (SELECT d.doc_id, {_score_sql()} AS bm25 FROM d CROSS JOIN s)
ORDER BY bm25 DESC, doc_id ASC
LIMIT {_TOPN}
"""


@register("text_bm25_topk", oracle=_bm25_oracle(), tags=("text", "retrieval"))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_TOPN} retrieval for a fixed query ({_TERMS}): tf/dl are
    map-only array expressions, df/avgdl one broadcast stats row, top-k a
    TakeOrderedAndProject — the corpus is never shuffled."""
    docs = table(spark, sf_dir, "documents")
    d = docs.selectExpr("doc_id", "split(text, ' ') AS toks").selectExpr(
        "doc_id",
        "CAST(size(toks) AS BIGINT) AS dl",
        *[f"{_tf_expr(i, 'spark')} AS tf_{i}" for i in range(len(_TERMS))],
    )
    # the 1-row corpus stats are materialized driver-side and re-injected
    # as literals — the scalar-subquery execution model (two jobs, zero
    # joins; a literal-key broadcast join gets constant-folded back into
    # a BNLJ, so this is also what keeps the plan-audit no-BNLJ invariant
    # strict).  bytes moved: one row.
    srow = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df_{i}")
            for i in range(len(_TERMS))
        ],
    ).first()
    lits = [
        f"CAST({srow['n_docs']} AS BIGINT) AS n_docs",
        # repr() is the shortest exact round-trip, so the literal parses
        # back to the identical double the oracle computes
        f"CAST({srow['avgdl']!r} AS DOUBLE) AS avgdl",
        *[
            f"CAST({srow[f'df_{i}']} AS BIGINT) AS df_{i}"
            for i in range(len(_TERMS))
        ],
    ]
    scored = d.selectExpr("doc_id", "dl", *[f"tf_{i}" for i in range(len(_TERMS))], *lits
    ).selectExpr("doc_id", f"{_score_sql()} AS bm25")
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(_TOPN)
    # rank over the already-limited top slice: the window sees _TOPN rows,
    # not the corpus, so the single-partition window is driver-scale
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "bm25"
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and vector ranks
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_SCALE = 1_000_000_000  # 1/(k+r) in exact integer fixed point
_RRF_TOPN = 10
_VEC_QID = 0


def _e6_py(x: float) -> int:
    """Python twin of SQL ROUND(x*1e6) (half away from zero — Python's
    round() is half-even and must not be used here)."""
    import math

    v = x * 1e6
    return int(math.floor(abs(v) + 0.5) * (1 if v >= 0 else -1))


def _rrf_oracle() -> str:
    lex = _bm25_oracle().rstrip()
    dot = (
        "list_aggregate(list_transform(range(1, 65), i -> "
        "CAST(ROUND(CAST(e.embedding[i] AS DOUBLE) * 1000000) AS BIGINT)"
        " * CAST(ROUND(CAST(q.embedding[i] AS DOUBLE) * 1000000) AS BIGINT)), 'sum')"
    )
    n2 = (
        "list_aggregate(list_transform(range(1, 65), i -> "
        "CAST(ROUND(CAST({v}.embedding[i] AS DOUBLE) * 1000000) AS BIGINT)"
        " * CAST(ROUND(CAST({v}.embedding[i] AS DOUBLE) * 1000000) AS BIGINT)), 'sum')"
    )
    return f"""
WITH lex AS ({lex}),
vec AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS BIGINT)
           AS rank,
         vec_id, cosine
  FROM (
    SELECT e.vec_id,
           CAST({dot} AS DOUBLE)
             / (SQRT(CAST({n2.format(v='e')} AS DOUBLE))
                * SQRT(CAST({n2.format(v='q')} AS DOUBLE))) AS cosine
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {_VEC_QID}) q
    WHERE e.vec_id > {_VEC_QID}
  )
  ORDER BY cosine DESC, vec_id ASC
  LIMIT {_TOPN}
),
fused AS (
  SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id,
         COALESCE(l.rank, 0) AS lex_rank,
         COALESCE(v.rank, 0) AS vec_rank,
         (CASE WHEN l.rank IS NULL THEN 0
               ELSE {_RRF_SCALE} // ({_RRF_K} + l.rank) END)
         + (CASE WHEN v.rank IS NULL THEN 0
                 ELSE {_RRF_SCALE} // ({_RRF_K} + v.rank) END) AS rrf_score
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT)
         AS fused_rank,
       doc_id, lex_rank, vec_rank, CAST(rrf_score AS BIGINT) AS rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {_RRF_TOPN}
"""


@register("retrieval_rrf_fusion", oracle=_rrf_oracle(), tags=("retrieval", "similarity"))
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval via reciprocal-rank fusion: the
    BM25 top-{_TOPN} and the cosine top-{_TOPN} (query = embedding
    {_VEC_QID}, candidates share the document id space) full-outer-merge
    on id, each list contributing {_RRF_SCALE} DIV ({_RRF_K} + rank) —
    RRF in exact integer fixed point, so the fused ordering is
    bit-deterministic (float RRF ties are a classic flaky-eval source).
    The RAG-stack shape: both rank lists are already tiny (top-k each),
    so fusion costs nothing regardless of corpus size; each side's scan
    is its own registered, audited operator.  Query embedding rides in
    as a literal micro-int array (scalar-subquery pattern, no join
    against the corpus)."""
    from pyspark.sql import Window

    lex = text_bm25_topk(spark, sf_dir).selectExpr(
        "doc_id", "rank AS lex_rank"
    )
    emb = table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == _VEC_QID).select("embedding").first()
    q6 = [_e6_py(float(x)) for x in qrow["embedding"]]
    qlit = f"array({', '.join(str(v) for v in q6)})"
    qn2 = sum(v * v for v in q6)
    scored = emb.filter(F.col("vec_id") > _VEC_QID).selectExpr(
        "vec_id",
        f"""CAST(aggregate(zip_with(
              transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
              {qlit}, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)
            / (SQRT(CAST(aggregate(transform(embedding,
                 x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                      * CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
                 CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE))
               * SQRT(CAST({qn2} AS DOUBLE))) AS cosine""",
    )
    # top-N via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, no single-partition global sort) and ONLY THEN a window
    # over the {_TOPN}-row slice — the same discipline as the BM25 side
    top = scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(_TOPN)
    wv = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    vec = top.withColumn("rank", F.row_number().over(wv).cast("long")).select(
        "vec_id", F.col("rank").alias("vec_rank")
    )
    fused = lex.join(vec, lex.doc_id == vec.vec_id, "full_outer").selectExpr(
        "COALESCE(doc_id, vec_id) AS doc_id",
        "COALESCE(lex_rank, 0) AS lex_rank",
        "COALESCE(vec_rank, 0) AS vec_rank",
        f"(CASE WHEN lex_rank IS NULL THEN 0"
        f" ELSE {_RRF_SCALE} DIV ({_RRF_K} + lex_rank) END)"
        f" + (CASE WHEN vec_rank IS NULL THEN 0"
        f" ELSE {_RRF_SCALE} DIV ({_RRF_K} + vec_rank) END) AS rrf_score",
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= _RRF_TOPN)
        .selectExpr(
            "fused_rank", "doc_id", "lex_rank", "vec_rank",
            "CAST(rrf_score AS BIGINT) AS rrf_score",
        )
    )


# ---------------------------------------------------------------------------
# RAG corpus preparation: sliding-window chunking + deterministic chunk
# embedding + query top-k — the retrieval-augmented-generation ingest
# path (chunk the corpus, embed each chunk, serve nearest chunks).
# Chunk/embed are map-only over the document scan (zero shuffle at any
# corpus size); the final top-k compiles to TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_CH_C = 64  # chunk size (tokens)
_CH_S = 48  # stride (tokens) -> 16-token overlap between chunks
_CH_P = 1_000_000_007  # chunk-hash modulus (matches rolling fingerprint)


def _chunk_cte_duck() -> str:
    """DuckDB CTE producing (doc_id, th, chunk_idx, start): token hashes
    materialized once, chunk starts every _CH_S tokens while < n."""
    from copperhead_spark.functions.text import token_hashes_duck

    return f"""
t AS (SELECT doc_id, {token_hashes_duck()} AS th FROM documents),
ch AS (
  SELECT doc_id, th,
         unnest(range(0, (length(th) + {_CH_S} - 1) // {_CH_S})) AS chunk_idx
  FROM t
)"""


@register(
    "text_chunk_overlap",
    oracle=f"""
WITH {_chunk_cte_duck()}
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {_CH_S} AS BIGINT) AS chunk_start,
       CAST(LEAST({_CH_C}, length(th) - chunk_idx * {_CH_S}) AS BIGINT)
         AS n_chunk_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           th[chunk_idx * {_CH_S} + 1 : chunk_idx * {_CH_S} + {_CH_C}]),
         (acc, h) -> (acc * 31 + h) % {_CH_P}) AS chunk_hash
FROM ch
""",
    tags=("text", "retrieval", "rag"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({_CH_C}-token chunks, stride
    {_CH_S} = {_CH_C - _CH_S}-token overlap): the RAG/embedding ingest
    primitive.  Each chunk carries its token span and an order-sensitive
    polynomial hash of its token-hash sequence, so chunk content is
    value-pinned without shipping chunk text.  Built array-native: token
    hashes once per document (O(len)), chunk starts from a sequence
    explode, per-chunk fold over an array slice — map-only, the corpus
    is never shuffled, and the explode factor (~n_tokens/{_CH_S}) is the
    output's inherent size, not plan overhead."""
    from copperhead_spark.functions.text import token_hashes_spark
    from copperhead_spark.operators.barrier import project_once

    docs = table(spark, sf_dir, "documents")
    toks = project_once(
        docs, "doc_id", f"{token_hashes_spark()} AS th"
    )
    chunks = toks.selectExpr(
        "doc_id",
        "th",
        f"posexplode(sequence(0, CAST(ceil(size(th) / {_CH_S}.0) AS INT) - 1))"
        " AS (chunk_idx, start_k)",
    )
    return chunks.selectExpr(
        "doc_id",
        "CAST(chunk_idx AS BIGINT) AS chunk_idx",
        f"CAST(chunk_idx * {_CH_S} AS BIGINT) AS chunk_start",
        f"CAST(LEAST({_CH_C}, size(th) - chunk_idx * {_CH_S}) AS BIGINT)"
        " AS n_chunk_tokens",
        f"aggregate(slice(th, chunk_idx * {_CH_S} + 1, {_CH_C}),"
        f" CAST(0 AS BIGINT), (acc, h) -> (acc * 31 + h) % {_CH_P})"
        " AS chunk_hash",
    )


# deterministic 8-dim integer chunk embedding: dim j of a chunk is the
# sum over its token hashes h of ((h * A_j + B_j) mod M31) mod 1009 —
# pure integer arithmetic, so Spark, DuckDB, and the Python-side query
# vector agree bit-for-bit (the same portability rule as minhash).
_EMB_D = 8
_EMB_M = 2_147_483_647
_EMB_Q = 1009
_EMB_AB = [(7919 * j + 104_729, 1_000_003 * j + 613) for j in range(_EMB_D)]
_RAG_K = 20
_RAG_QUERY = "training data quality and dedup for language model corpus"


def _tok_hash_py(w: str) -> int:
    from copperhead_spark.functions.text import TOKEN_P

    acc = 0
    for c in w:
        acc = (acc * 31 + ord(c)) % TOKEN_P
    return acc


def _query_vec() -> list[int]:
    toks = [_tok_hash_py(w) for w in _RAG_QUERY.split(" ")]
    return [
        sum(((h * a + b) % _EMB_M) % _EMB_Q for h in toks)
        for a, b in _EMB_AB
    ]


def _rag_oracle() -> str:
    vq = _query_vec()
    dims_duck = ", ".join(
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), chunk), "
        f"(acc, h) -> acc + ((h * {a} + {b}) % {_EMB_M}) % {_EMB_Q}) AS v{j}"
        for j, (a, b) in enumerate(_EMB_AB)
    )
    dot = " + ".join(f"CAST({vq[j]} AS BIGINT) * v{j}" for j in range(_EMB_D))
    return f"""
WITH {_chunk_cte_duck()},
emb AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, {dims_duck}
  FROM (
    SELECT doc_id, chunk_idx,
           th[chunk_idx * {_CH_S} + 1 : chunk_idx * {_CH_S} + {_CH_C}] AS chunk
    FROM ch
  )
)
SELECT doc_id, chunk_idx, CAST({dot} AS BIGINT) AS dot
FROM emb
ORDER BY dot DESC, doc_id, chunk_idx
LIMIT {_RAG_K}
"""


@register(
    "pipeline_rag_chunk_embed_topk",
    oracle=_rag_oracle(),
    tags=("retrieval", "rag", "pipeline"),
)
def pipeline_rag_chunk_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG serving path END-TO-END in one plan: chunk the corpus
    (sliding {_CH_C}/{_CH_S} windows) -> embed every chunk (deterministic
    {_EMB_D}-dim integer embedding) -> rank against a query vector by
    exact integer dot product -> global top-{_RAG_K}.  The query vector
    is computed driver-side from the SAME integer formula (literal
    constants in the plan — no join needed for a single query).

    Integer similarity makes the ranking bit-reproducible across
    engines; ties break on (doc_id, chunk_idx).  Scale: chunk+embed are
    map-only expression work on the corpus scan; ORDER BY+LIMIT compiles
    to TakeOrderedAndProject (per-partition heaps, driver merge of
    {_RAG_K} rows/partition) — nothing resembling a global sort, and the
    only data crossing the driver is the top-k.  The production-scale
    index variant of the same shape (IVF cells, PQ codes) is
    pipeline_ann_query_e2e; this query pins the text->chunk->embed front
    half that feeds it."""
    from copperhead_spark.functions.text import token_hashes_spark
    from copperhead_spark.operators.barrier import project_once

    vq = _query_vec()
    docs = table(spark, sf_dir, "documents")
    toks = project_once(docs, "doc_id", f"{token_hashes_spark()} AS th")
    exploded = toks.selectExpr(
        "doc_id",
        "th",
        f"explode(sequence(0, CAST(ceil(size(th) / {_CH_S}.0) AS INT) - 1))"
        " AS chunk_idx",
    )
    chunks = project_once(
        exploded,
        "doc_id",
        "chunk_idx",
        f"slice(th, chunk_idx * {_CH_S} + 1, {_CH_C}) AS chunk",
    )
    dims = [
        f"aggregate(chunk, CAST(0 AS BIGINT),"
        f" (acc, h) -> acc + ((h * {a} + {b}) % {_EMB_M}) % {_EMB_Q}) AS v{j}"
        for j, (a, b) in enumerate(_EMB_AB)
    ]
    emb = chunks.selectExpr(
        "doc_id", "CAST(chunk_idx AS BIGINT) AS chunk_idx", *dims
    )
    dot = " + ".join(f"CAST({vq[j]} AS BIGINT) * v{j}" for j in range(_EMB_D))
    return (
        emb.selectExpr("doc_id", "chunk_idx", f"CAST({dot} AS BIGINT) AS dot")
        .orderBy(F.col("dot").desc(), "doc_id", "chunk_idx")
        .limit(_RAG_K)
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms (keyword extraction)
# ---------------------------------------------------------------------------

_TFIDF_TOPN = 3

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(ROUND(tf * LN(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e9)
              AS BIGINT) / 1e9 AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
  ) AS rn FROM scored
) WHERE rn <= %(topn)s
""" % {"topn": _TFIDF_TOPN}


@register("text_tfidf_topterms", oracle=_TFIDF_ORACLE, tags=("retrieval", "text"))
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-{_TFIDF_TOPN} terms by
    tf * ln(N/df).  Corpus is tokenized ONCE; (doc, term) counts and the
    vocab-sized df table are both partial-agg shuffles; the df join is a
    hash join on term (at 100 TB the vocab side is still ~millions of
    rows — joinable, never collected); final ranking is a per-doc window.
    LN wobble is absorbed by 1e-9 fixed-point rounding (same discipline
    as BM25 above); ties break on term text."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.selectExpr(
        "doc_id", "explode(filter(split(text, ' '), w -> w != '')) AS term"
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df derived FROM tf (r12): rows of tf are exactly the distinct
    # (doc, term) pairs, so COUNT(*) per term == COUNT(DISTINCT doc_id)
    # over the raw token stream.  The old df branch shuffled the full
    # exploded token stream a second time through a count_distinct
    # expansion; this branch aggregates the already-reduced (doc, term)
    # partials (measured 1.90 -> 1.48 s at sf0.1).  The tokenize subtree
    # is still referenced twice (no CSE across the join's sides) — a
    # localCheckpoint of tf removes the double scan but serializes the
    # two branches and measured strictly worse at bench scale (3.8 s);
    # at 100 TB the seam is a tf-table parquet write instead.
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.expr(
            f"CAST(ROUND(tf * LN(CAST({n_docs} AS DOUBLE) / CAST(df AS DOUBLE)) * 1e9)"
            " AS BIGINT) / 1e9"
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOPN)
        .select("doc_id", "term", "tfidf", F.col("rn").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# ColBERT-style MaxSim late-interaction retrieval
# ---------------------------------------------------------------------------

_MS_QUERIES = (
    (0, "data model training"),
    (1, "spark query plan"),
    (2, "merge window state"),
)
_MS_TOPK = 5


def _ms_dim_terms(h: str) -> list[str]:
    return [f"((({h}) * {a} + {b}) % {_EMB_M}) % {_EMB_Q}" for a, b in _EMB_AB]


def _ms_dot(ha: str, hb: str) -> str:
    return " + ".join(
        f"CAST({da} AS BIGINT) * CAST({db} AS BIGINT)"
        for da, db in zip(_ms_dim_terms(ha), _ms_dim_terms(hb))
    )


def _maxsim_oracle() -> str:
    from copperhead_spark.functions.text import token_hashes_duck

    qvals = ", ".join(f"({i}, '{t}')" for i, t in _MS_QUERIES)
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest({token_hashes_duck()}) AS hd FROM documents
),
q0 AS (SELECT * FROM (VALUES {qvals}) t(qid, qtext)),
qt AS (
  SELECT DISTINCT qid, unnest({token_hashes_duck("qtext")}) AS hq FROM q0
),
best AS (
  SELECT dt.doc_id, qt.qid, qt.hq,
         MAX({_ms_dot("dt.hd", "qt.hq")}) AS m
  FROM dt CROSS JOIN qt
  GROUP BY 1, 2, 3
),
score AS (
  SELECT doc_id, qid, CAST(SUM(m) AS BIGINT) AS maxsim
  FROM best GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, doc_id, maxsim, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY maxsim DESC, doc_id ASC
  ) AS rn FROM score
) WHERE rn <= {_MS_TOPK}
"""


@register("emb_maxsim_topk", oracle=_maxsim_oracle(), tags=("retrieval", "ann"))
def emb_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval: every query token keeps
    its own embedding, MaxSim(q, d) = sum over query tokens of the MAX
    dot product against any document token, top-{_MS_TOPK} documents per
    query.  Token embeddings are the deterministic integer recipe the
    RAG pipeline uses (same _EMB_AB lattice), so every dot product,
    max, and sum is exact BIGINT arithmetic.

    Scale design: the document side is a DISTINCT (doc, token-hash)
    stream — never the corpus text — and the query-token table (a few
    dozen rows) broadcasts via a non-foldable constant-key hash join,
    so the token-pair expansion is map-side with NO shuffle of the
    corpus; the only exchanges are the two partial aggregations
    (per-query-token max, then per-doc sum), and the final top-k is a
    per-query window.  At production scale the expansion is pruned by a
    per-token ANN shortlist first (sim_ivf_topk is that operator); this
    query pins the exact late-interaction semantics the pruned plan
    must reproduce.

    Reference analogue: none (retrieval surface beyond the reference,
    alongside BM25 and the RAG chunk pipeline)."""
    from copperhead_spark.functions.text import token_hashes_spark

    docs = table(spark, sf_dir, "documents")
    dt = docs.selectExpr(
        "doc_id", f"explode({token_hashes_spark()}) AS hd"
    ).distinct()
    qdf = spark.createDataFrame(list(_MS_QUERIES), "qid BIGINT, qtext STRING")
    qt = qdf.selectExpr(
        "qid", f"explode({token_hashes_spark('qtext')}) AS hq"
    ).distinct()
    pairs = dt.selectExpr("doc_id", "hd", "CAST(hd * 0 AS BIGINT) AS k").join(
        F.broadcast(qt.selectExpr("qid", "hq", "CAST(hq * 0 AS BIGINT) AS k")), "k"
    )
    best = (
        pairs.selectExpr("doc_id", "qid", "hq", f"{_ms_dot('hd', 'hq')} AS dot")
        .groupBy("doc_id", "qid", "hq")
        .agg(F.max("dot").alias("m"))
    )
    score = best.groupBy("doc_id", "qid").agg(F.sum("m").cast("long").alias("maxsim"))
    w = Window.partitionBy("qid").orderBy(F.col("maxsim").desc(), F.col("doc_id").asc())
    return (
        score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MS_TOPK)
        .select("qid", "doc_id", "maxsim", F.col("rn").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# diversified top-k (bounded results per group)
# ---------------------------------------------------------------------------

_DIV_PER_NATION = 2
_DIV_TOPK = 10

_DIV_ORACLE = f"""
WITH r AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY ROUND(c_acctbal * 100) DESC, c_custkey ASC
         ) AS rn_nation
  FROM customer
),
d AS (SELECT * FROM r WHERE rn_nation <= {_DIV_PER_NATION})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bal_c DESC, c_custkey ASC) AS BIGINT)
         AS rank,
       c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, bal_c
FROM d ORDER BY rank LIMIT {_DIV_TOPK}
"""


@register("retrieval_diversified_topk", oracle=_DIV_ORACLE, tags=("retrieval", "O3"))
def retrieval_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k: the best {_DIV_TOPK} customers by balance with
    AT MOST {_DIV_PER_NATION} per nation — the result-diversification
    constraint every search/recommendation surface applies so one group
    cannot monopolize the page.  Two deterministic window ranks: a
    per-group cap, then the global order over the survivors.

    Scale design: the per-group rank is a hash-partitioned window (the
    100 TB side, fully parallel); the global rank runs only on the
    capped survivors ({_DIV_PER_NATION} x |groups| rows — roster-sized),
    where a single-partition window is the correct plan, and the final
    top-k compiles to TakeOrderedAndProject.  The naive alternative —
    global sort, then scan-and-skip — cannot cap groups without a
    sequential pass.

    Reference analogue: O3 top-k per group composed with O2 global
    top-k; the diversification constraint is the retrieval-stack
    addition."""
    cust = table(spark, sf_dir, "customer")
    r = cust.selectExpr(
        "c_custkey",
        "CAST(c_nationkey AS BIGINT) AS c_nationkey",
        "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c",
    ).withColumn(
        "rn_nation",
        F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy(
                F.col("bal_c").desc(), F.col("c_custkey").asc()
            )
        ),
    )
    d = r.filter(F.col("rn_nation") <= _DIV_PER_NATION)
    wg = Window.orderBy(F.col("bal_c").desc(), F.col("c_custkey").asc())
    return (
        d.withColumn("rank", F.row_number().over(wg).cast("long"))
        .filter(F.col("rank") <= _DIV_TOPK)
        .select("rank", "c_custkey", "c_nationkey", "bal_c")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# ranking-quality evaluation: nDCG@10 of the BM25 ranking against a
# deterministic pseudo-relevance label — the eval metric every retrieval
# pipeline publishes.  All transcendental pieces (1/log2(rank+1)) are
# PRECOMPUTED Python literals shared verbatim by both engines; each
# gain term is fixed-pointed to e9 before summation so the metric is
# integer-exact.  With binary relevance the ideal ranking's DCG depends
# only on the NUMBER of relevant docs, so IDCG is a prefix-sum CASE
# lookup on n_rel — no second aggregate, no scalar cross join.
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_REL_T = 0.3  # rel(doc) = 1 iff hash_u(doc_id) < 0.3


def _ndcg_discount_cases(rank_col: str) -> str:
    """CASE mapping rank -> ROUND(1e9 / log2(rank + 1)) as integer
    literals (identical text on both engines, no libm at query time)."""
    import math

    whens = " ".join(
        f"WHEN {rank_col} = {r} THEN {round(1e9 / math.log2(r + 1))}"
        for r in range(1, _NDCG_K + 1)
    )
    return f"CASE {whens} ELSE 0 END"


def _ndcg_idcg_cases(nrel_col: str) -> str:
    """CASE mapping n_rel -> IDCG@k in e9 (prefix sums of the discount
    literals): with 0/1 relevance the ideal list is just the relevant
    docs first, so IDCG is a function of their count alone."""
    import math

    pref = 0
    whens = []
    for r in range(1, _NDCG_K + 1):
        pref += round(1e9 / math.log2(r + 1))
        whens.append(f"WHEN {nrel_col} = {r} THEN {pref}")
    return f"CASE {' '.join(whens)} ELSE 0 END"


def _ndcg_oracle() -> str:
    from copperhead_spark.operators.rochester import hash_uniform_sql

    u = hash_uniform_sql("doc_id", "282589933")
    return f"""
WITH ranked AS (
  SELECT rank, doc_id,
         CASE WHEN {u} < {_NDCG_REL_T} THEN 1 ELSE 0 END AS rel
  FROM ({_bm25_oracle()})
  WHERE rank <= {_NDCG_K}
),
dcg AS (
  SELECT CAST(SUM(rel * ({_ndcg_discount_cases("rank")})) AS BIGINT) AS dcg_e9,
         CAST(SUM(rel) AS BIGINT) AS n_rel
  FROM ranked
)
SELECT CAST({_NDCG_K} AS BIGINT) AS k, n_rel, dcg_e9,
       CAST({_ndcg_idcg_cases("n_rel")} AS BIGINT) AS idcg_e9,
       CAST(CASE WHEN n_rel > 0
                 THEN dcg_e9 * 1000000 // ({_ndcg_idcg_cases("n_rel")})
                 ELSE 0 END AS BIGINT) AS ndcg_ppm
FROM dcg
"""


@register("retrieval_ndcg_eval", oracle=_ndcg_oracle(), tags=("retrieval", "eval"))
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{_NDCG_K} of the BM25 ranking against a deterministic hash
    pseudo-relevance label (rel = 1 iff hash_u(doc_id) < {_NDCG_REL_T} —
    reproducible 'ground truth' standing in for human judgments): DCG
    uses integer e9 discount literals precomputed in Python (no
    query-time libm anywhere); IDCG, with binary labels, is a prefix-sum
    CASE on the relevant-doc count; the final ratio ships in ppm — the
    retrieval twin of dedup_lsh_recall / sim_ivf_recall: the quality
    claim itself is oracle-checked.  Scale: the eval runs on the
    top-{_NDCG_K} slice (driver-sized, ONE aggregate row, no scalar
    cross join); the corpus cost is text_bm25_topk's map-only scoring
    pass."""
    from copperhead_spark.operators.rochester import hash_uniform_sql

    u = hash_uniform_sql("doc_id", "282589933")
    ranked = (
        text_bm25_topk(spark, sf_dir)
        .filter(F.col("rank") <= _NDCG_K)
        .selectExpr(
            "rank",
            "doc_id",
            f"CASE WHEN {u} < {_NDCG_REL_T} THEN 1 ELSE 0 END AS rel",
        )
    )
    dcg = ranked.agg(
        F.expr(
            f"CAST(SUM(rel * ({_ndcg_discount_cases('rank')})) AS BIGINT)"
        ).alias("dcg_e9"),
        F.sum("rel").cast("long").alias("n_rel"),
    )
    return dcg.selectExpr(
        f"CAST({_NDCG_K} AS BIGINT) AS k",
        "n_rel",
        "dcg_e9",
        f"CAST({_ndcg_idcg_cases('n_rel')} AS BIGINT) AS idcg_e9",
        "CAST(CASE WHEN n_rel > 0"
        f" THEN dcg_e9 * 1000000 DIV ({_ndcg_idcg_cases('n_rel')})"
        " ELSE 0 END AS BIGINT) AS ndcg_ppm",
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
