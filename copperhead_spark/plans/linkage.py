"""Record-linkage / tokenizer-training operators over the documents
table (beyond-reference LLM-pipeline capability, same family as
plans/dedup.py):

- blocked TF-IDF cosine pairs — the classic record-linkage shape:
  candidate pairs are generated only WITHIN a blocking key, never across
  the corpus, so pair volume is sum(|block|^2) instead of n^2.
- BPE pair counting — the map-reduce inner loop of byte-pair-encoding
  tokenizer training: count adjacent symbol pairs across the corpus.
- incremental dedup against a standing index — the "ingest tonight's
  crawl against the 100 TB corpus" shape: only the new batch is scanned
  for candidates; the index side contributes distinct keys.

All arithmetic is integer fixed point (tf * integer-scaled idf), so every
query is bit-exact against its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.operators.barrier import project_once
from copperhead_spark.functions.text import minhash_signature_spark, shingle_hashes_spark
from copperhead_spark.plans.dedup import _MH_DUCK
from copperhead_spark.plans.registry import register

# ---------------------------------------------------------------------------
# blocked TF-IDF cosine pairs
# ---------------------------------------------------------------------------

_IDF_SCALE = 100  # idf_e = (N * 100) DIV df  — integer, scale-free in N/df


@register(
    "text_tfidf_blocked_pairs",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS w
  FROM documents
),
tf AS (
  SELECT doc_id, lang, source, w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2, 3, 4
),
stats AS (
  SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
wt AS (
  SELECT t.doc_id, t.lang, t.source, t.w,
         t.tf * ((n.n_docs * {_IDF_SCALE}) // s.df) AS ww
  FROM tf t JOIN stats s ON t.w = s.w CROSS JOIN n
),
norms AS (
  SELECT doc_id, CAST(SUM(ww * ww) AS BIGINT) AS norm_sq FROM wt GROUP BY 1
),
dots AS (
  SELECT a.lang, a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.ww * b.ww) AS BIGINT) AS dot_ww
  FROM wt a
  JOIN wt b ON a.lang = b.lang AND a.source = b.source AND a.w = b.w
           AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT d.lang, d.source, d.doc_a, d.doc_b, d.dot_ww,
       na.norm_sq AS norm_a, nb.norm_sq AS norm_b
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
WHERE 2.0 * CAST(d.dot_ww AS DOUBLE) * CAST(d.dot_ww AS DOUBLE)
      >= CAST(na.norm_sq AS DOUBLE) * CAST(nb.norm_sq AS DOUBLE)
""",
    tags=("linkage", "text", "dedup"),
)
def text_tfidf_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked TF-IDF cosine similarity pairs (cos^2 >= 1/2) within
    (lang, source) blocks.  Fixed-point weights: ww = tf * ((N*100) DIV
    df), so dot products and norms are exact BIGINTs; the threshold test
    runs in doubles (int64->double conversion and * are correctly
    rounded, hence engine-identical).

    Scale: the pair join's shuffle key is (lang, source, term) — only
    block-mates ever meet, so pair volume is sum(|block|^2), the
    record-linkage blocking bound.  df/N stats are vocab-sized
    (broadcast); the corpus is shuffled once to build tf."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", "source", F.explode(F.split("text", " ")).alias("w")
    )
    tf = tok.groupBy("doc_id", "lang", "source", "w").agg(
        F.count("*").alias("tf")
    )
    stats = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    # 1-row corpus size, driver-materialized and re-injected as a literal
    # (scalar-subquery execution model, same as text_bm25_topk)
    n_docs = docs.count()
    wt = tf.join(F.broadcast(stats), "w").select(
        "doc_id",
        "lang",
        "source",
        "w",
        F.expr(f"tf * (({n_docs} * {_IDF_SCALE}) DIV df)").alias("ww"),
    )
    norms = wt.groupBy("doc_id").agg(F.sum(F.expr("ww * ww")).alias("norm_sq"))
    a, b = wt.alias("a"), wt.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.lang").alias("lang"),
            F.col("a.source").alias("source"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.sum(F.col("a.ww") * F.col("b.ww")).alias("dot_ww"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm_sq").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm_sq").alias("norm_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            2.0 * F.col("dot_ww").cast("double") * F.col("dot_ww").cast("double")
            >= F.col("norm_a").cast("double") * F.col("norm_b").cast("double")
        )
        .select("lang", "source", "doc_a", "doc_b", "dot_ww", "norm_a", "norm_b")
    )


# ---------------------------------------------------------------------------
# BPE pair counting (tokenizer-training inner loop)
# ---------------------------------------------------------------------------

_BPE_TOPK = 20

_BPE_PAIRS_SPARK = """
flatten(transform(split(text, ' '),
  tok -> CASE WHEN length(tok) >= 2
              THEN transform(sequence(1, length(tok) - 1, 1),
                             i -> substring(tok, i, 2))
              ELSE array() END))
"""

_BPE_PAIRS_DUCK = """
flatten(list_transform(string_split(text, ' '),
  tok -> CASE WHEN length(tok) >= 2
              THEN list_transform(range(1, length(tok)),
                                  i -> substring(tok, i, 2))
              ELSE [] END))
"""


@register(
    "text_bpe_pair_counts",
    oracle=f"""
WITH pairs AS (
  SELECT unnest({_BPE_PAIRS_DUCK}) AS pair FROM documents
),
counts AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rank,
       pair, n
FROM counts
ORDER BY n DESC, pair ASC
LIMIT {_BPE_TOPK}
""",
    tags=("linkage", "text", "tokenizer"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge-selection step: count adjacent character
    pairs inside whitespace tokens across the corpus, rank the top
    candidates (deterministic tiebreak on the pair string).  Map-only
    explode + one partial-agg groupBy + TakeOrderedAndProject; the merge
    loop re-runs this with the chosen pair fused — each round is the same
    linear scan."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.expr(_BPE_PAIRS_SPARK)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(_BPE_TOPK)
        .select("rank", "pair", "n")
    )


# ---------------------------------------------------------------------------
# incremental dedup against a standing index
# ---------------------------------------------------------------------------

_BATCH_MOD = 5  # doc_id % 5 == 4 is "tonight's crawl"; the rest is the index
_BANDS = 4  # 4 bands x 2 rows over the 8-minhash signature (plans/dedup.py)

_IDX_SIG_DUCK = "SELECT doc_id, " + ", ".join(
    f"{m} AS mh{k}" for k, m in enumerate(_MH_DUCK)
) + " FROM documents"

_BAND_KEY_DUCK = [
    f"CAST(mh{2 * b} AS VARCHAR) || '_' || CAST(mh{2 * b + 1} AS VARCHAR)"
    for b in range(_BANDS)
]


@register(
    "dedup_incremental_index",
    oracle=f"""
WITH sig AS ({_IDX_SIG_DUCK}),
bands AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, {key} AS band_key FROM sig"
    for b, key in enumerate(_BAND_KEY_DUCK)
  )}
),
fp AS (SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents),
batch AS (SELECT * FROM fp WHERE doc_id % {_BATCH_MOD} = {_BATCH_MOD - 1}),
idx_fp AS (SELECT DISTINCT fingerprint FROM fp
           WHERE doc_id % {_BATCH_MOD} <> {_BATCH_MOD - 1}),
idx_bands AS (SELECT DISTINCT band, band_key FROM bands
              WHERE doc_id % {_BATCH_MOD} <> {_BATCH_MOD - 1})
SELECT b.doc_id,
       CASE WHEN EXISTS (SELECT 1 FROM idx_fp i
                         WHERE i.fingerprint = b.fingerprint) THEN 'exact'
            WHEN EXISTS (SELECT 1 FROM bands bb JOIN idx_bands ib
                           ON bb.band = ib.band AND bb.band_key = ib.band_key
                         WHERE bb.doc_id = b.doc_id) THEN 'near'
            ELSE 'unique' END AS dup_kind
FROM batch b
""",
    tags=("linkage", "dedup", "incremental"),
)
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: classify each NEW document (doc_id % 5 == 4)
    against the standing index (the rest) as 'exact' (content fingerprint
    already indexed), 'near' (shares a MinHash LSH band bucket with any
    indexed doc), or 'unique'.

    Scale: the index side reduces to DISTINCT fingerprints / band keys —
    at 100 TB these are the dedup index tables you maintain anyway, and
    the joins are batch-sized semi-joins on those keys; the full index
    text is never read.  Signature computation is per-row HOF expressions
    on the batch only."""
    docs = table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", F.md5(F.lower(F.col("text"))).alias("fingerprint")
    )
    sig = project_once(
        docs,
        "doc_id",
        f"{minhash_signature_spark(shingle_hashes_spark())} AS sig",
    )
    bands = None
    for b in range(_BANDS):
        part = sig.selectExpr(
            "doc_id",
            f"{b} AS band",
            f"CONCAT(CAST(element_at(sig, {2 * b + 1}) AS STRING), '_',"
            f" CAST(element_at(sig, {2 * b + 2}) AS STRING)) AS band_key",
        )
        bands = part if bands is None else bands.unionByName(part)

    is_batch = F.col("doc_id") % _BATCH_MOD == _BATCH_MOD - 1
    batch = fp.filter(is_batch)
    idx_fp = fp.filter(~is_batch).select("fingerprint").distinct()
    idx_bands = bands.filter(~is_batch).select("band", "band_key").distinct()

    exact_hits = batch.join(idx_fp, "fingerprint", "left_semi").select(
        "doc_id", F.lit(1).alias("is_exact")
    )
    near_hits = (
        bands.filter(is_batch)
        .join(idx_bands, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(1).alias("is_near"))
    )
    return (
        batch.select("doc_id")
        .join(exact_hits, "doc_id", "left")
        .join(near_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact") == 1, "exact")
            .when(F.col("is_near") == 1, "near")
            .otherwise("unique")
            .alias("dup_kind"),
        )
    )


# ---------------------------------------------------------------------------
# market-basket association rules: the Apriori level-2 classic — pair
# support within orders, confidence and lift per directed rule.  All
# ratios in integer fixed point (micro-units, integer division), so the
# oracle reproduces every bit.
# ---------------------------------------------------------------------------

_MB_MIN_SUP = 2  # orders containing the pair


@register(
    "market_basket_rules",
    oracle=f"""
WITH pe AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
item AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS sup FROM pe GROUP BY p),
n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM pe),
pair AS (
  SELECT a.p AS ante, b.p AS cons, CAST(COUNT(*) AS BIGINT) AS sup_pair
  FROM pe a JOIN pe b ON a.okey = b.okey AND a.p <> b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {_MB_MIN_SUP}
)
SELECT ante, cons, sup_pair,
       (sup_pair * 1000000) // ia.sup AS confidence_e6,
       (sup_pair * n.n_orders * 1000000) // (ia.sup * ic.sup) AS lift_e6
FROM pair
JOIN item ia ON ia.p = ante
JOIN item ic ON ic.p = cons
CROSS JOIN n
""",
    tags=("linkage", "graph"),
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules ante→cons with support >= {_MB_MIN_SUP}
    orders: confidence = sup(pair)/sup(ante), lift =
    n_orders*sup(pair)/(sup(ante)*sup(cons)), both in exact micro-unit
    integer division.  Pair expansion is the per-order sorted-set
    transform (one shuffle, no self-join of the item stream); item
    supports are a vocabulary-sized partial agg joined back BROADCAST
    (the item table is dimension-sized); the total-order count is one
    scalar inlined driver-side (the sample_domain_mixture pattern)."""
    from copperhead_spark.plans.graph import _order_part_sets

    po = _order_part_sets(spark, sf_dir)
    # directed pairs (x != y) per order from the sorted per-order set
    pairs = po.selectExpr(
        """
        explode(flatten(transform(ps, (x, i) ->
          transform(filter(ps, y -> y != x), y -> struct(x AS ante, y AS cons))))) AS e
        """
    ).select("e.ante", "e.cons")
    pair_sup = (
        pairs.groupBy("ante", "cons")
        .agg(F.count("*").cast("long").alias("sup_pair"))
        .filter(F.col("sup_pair") >= _MB_MIN_SUP)
    )
    item = (
        po.selectExpr("explode(ps) AS p")
        .groupBy("p")
        .agg(F.count("*").cast("long").alias("sup"))
    )
    n_orders = int(po.count())
    ia = item.selectExpr("p AS ante", "sup AS sup_a")
    ic = item.selectExpr("p AS cons", "sup AS sup_c")
    return (
        pair_sup.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .selectExpr(
            "ante",
            "cons",
            "sup_pair",
            "(sup_pair * 1000000) div sup_a AS confidence_e6",
            f"(sup_pair * {n_orders} * 1000000) div (sup_a * sup_c) AS lift_e6",
        )
    )


# ---------------------------------------------------------------------------
# BPE merge TRAINING (the iterative loop whose single step is
# text_bpe_pair_counts): each round counts adjacent symbol pairs across
# the corpus, adopts the most frequent pair (ties broken lexicographically)
# as a merge, and re-tokenizes with the merge applied — greedy
# left-to-right, the standard BPE semantics, expressed as a fold that
# replaces [.., L] + R with [.., LR].  The chosen pair is one scalar per
# round: Spark materializes it driver-side (argmax of a partial-agg count
# table) and inlines it as a literal in the next round's expression; the
# oracle carries it as a cross-joined 1-row CTE through the identical
# unrolled rounds.
#
# Scale: each round is explode + partial-agg count (pair-vocabulary
# cardinality crosses the wire) + an O(1) argmax collect; the re-tokenize
# is a map-only array fold fused into the next round's scan.  Real
# tokenizer training runs hundreds of rounds on a WORD-FREQUENCY table
# (count each distinct token once, weight pairs by token count) — that
# variant drops corpus cost from O(tokens) to O(vocab) per round and is
# the same plan with one extra pre-aggregation.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_chars_duck(w: str) -> str:
    return f"list_transform(range(1, length({w}) + 1), i -> substring({w}, i, 1))"


def _bpe_pairs_duck(a: str) -> str:
    return f"list_transform(range(1, len({a})), i -> {{'l': {a}[i], 'r': {a}[i + 1]}})"


def _bpe_merge_duck(syms: str, lcol: str, rcol: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST([] AS VARCHAR[]),"
        f" list_transform({syms}, s -> [s])),"
        f" (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = {lcol} AND x[1] = {rcol}"
        f" THEN list_append(acc[1:-2], {lcol} || {rcol})"
        f" ELSE list_append(acc, x[1]) END)"
    )


def _bpe_pairs_spark(a: str) -> str:
    m = f"greatest(size({a}) - 1, 0)"
    return (
        f"zip_with(slice({a}, 1, {m}), slice({a}, 2, {m}),"
        f" (x, y) -> struct(x AS l, y AS r))"
    )


def _bpe_merge_spark(syms: str, lit_l: str, lit_r: str) -> str:
    return (
        f"aggregate({syms}, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = {lit_l} AND s = {lit_r}, "
        f"concat(slice(acc, 1, size(acc) - 1), array(concat({lit_l}, {lit_r}))), "
        f"concat(acc, array(s))))"
    )


def _sql_str(s: str) -> str:
    """Spark SQL single-quoted literal (backslash-escaping dialect)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bpe_train_ctes() -> tuple[list[str], list[str]]:
    """(CTE parts, per-round selects) of the BPE-training oracle —
    exposed so the train->encode E2E oracle (plans/tokenize.py) can
    compose the SAME trainer CTEs with the recursive encode."""
    parts = [
        "toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)",
        f"s0 AS MATERIALIZED (SELECT {_bpe_chars_duck('w')} AS a FROM toks)",
    ]
    unions = []
    for i in range(1, _BPE_ROUNDS + 1):
        parts.append(
            f"""p{i} AS (
  SELECT t.pr.l AS l, t.pr.r AS r, CAST(COUNT(*) AS BIGINT) AS n
  FROM s{i - 1} CROSS JOIN LATERAL (
    SELECT unnest({_bpe_pairs_duck("a")}) AS pr
  ) t GROUP BY 1, 2
)"""
        )
        parts.append(f"b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1)")
        if i < _BPE_ROUNDS:
            parts.append(
                f"s{i} AS MATERIALIZED (SELECT {_bpe_merge_duck('a', 'b.l', 'b.r')} AS a"
                f" FROM s{i - 1} CROSS JOIN b{i} b)"
            )
        unions.append(
            f"SELECT {i} AS round, l AS left_sym, r AS right_sym, n AS pair_count FROM b{i}"
        )
    return parts, unions


def _bpe_train_oracle() -> str:
    parts, unions = _bpe_train_ctes()
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(unions)


@register(
    "text_bpe_train_merges",
    oracle=_bpe_train_oracle(),
    tags=("text", "linkage", "iterative"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_BPE_ROUNDS}-round BPE training: per round, the corpus-wide
    adjacent-pair count's argmax (count DESC, then lexicographic — the
    deterministic tie-break both engines share) becomes a merge that is
    applied greedily left-to-right before the next round.  Returns the
    merge table (round, left_sym, right_sym, pair_count).

    Vocabulary-factorized (the text_bpe_encode lesson applied to
    TRAINING): a word's pair multiset times its corpus frequency equals
    the token stream's pair counts exactly, so the corpus is reduced
    ONCE to (distinct word, count) — after that every round's pair
    argmax explodes pairs over the |vocab|-sized table with SUM(cnt)
    weights instead of re-scanning the full token stream with a
    progressively deeper merge expression (measured 3 rounds at sf0.1:
    ~17s -> sub-second; at 100 TB the stream is trillions of tokens
    while the vocab is millions of rows, so per-round cost detaches
    from corpus size entirely)."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.selectExpr("explode(split(text, ' ')) AS w")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        # one corpus pass, reused by every round
        .localCheckpoint()
    )
    syms = "split(w, '')"
    merges = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        best = (
            wc.selectExpr(f"explode({_bpe_pairs_spark(syms)}) AS pr", "cnt")
            .groupBy("pr.l", "pr.r")
            .agg(F.sum("cnt").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .first()
        )
        merges.append((rnd, best["l"], best["r"], best["n"]))
        syms = _bpe_merge_spark(syms, _sql_str(best["l"]), _sql_str(best["r"]))
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, pair_count long"
    )


# ---------------------------------------------------------------------------
# fuzzy (edit-distance) record linkage: the approximate-string-match
# operator behind entity resolution — near-identical names that exact
# dedup misses.  Both engines implement classic Levenshtein identically
# (verified on crafted cases), so the pair set is fully oracle-checked.
# ---------------------------------------------------------------------------

_FUZZ_MAX = 3  # edit distance band: 1..3 (0 would be exact dedup's job)

# the blocked fuzzy join, shared verbatim by the pairs oracle and the
# entity-resolution oracle (one drifting copy would let the pipeline
# resolve a different pair set than the operator it composes)
_FUZZ_JOIN_DUCK = f"""
FROM (SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM part) a
JOIN (SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM part) c
  ON a.blk = c.blk AND a.p_partkey < c.p_partkey
WHERE levenshtein(a.p_name, c.p_name) BETWEEN 1 AND {_FUZZ_MAX}
"""


@register(
    "linkage_fuzzy_name_pairs",
    oracle=f"""
SELECT a.p_partkey AS key1, c.p_partkey AS key2,
       a.p_name AS name1, c.p_name AS name2,
       CAST(levenshtein(a.p_name, c.p_name) AS BIGINT) AS dist
{_FUZZ_JOIN_DUCK}
""",
    tags=("linkage",),
)
def linkage_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match pairs on part names: candidates only within
    the first-token blocking key (pair volume sum(|block|^2), never n^2 —
    the text_tfidf_blocked_pairs discipline), kept when Levenshtein
    distance is in [1, {_FUZZ_MAX}].  At 100 TB the blocking key would be
    a phonetic/sorted-neighborhood key sized so blocks stay bounded; the
    edit distance itself is a JVM builtin evaluated post-join, never a
    Python UDF."""
    from copperhead_spark.operators.barrier import widen_if_narrow

    # widen the single-split scan before the block join: the levenshtein
    # evaluation runs map-side on the join's STREAM side, and a one-task
    # scan serialized 101 CPU-s of edit distances onto 2 tasks (r12
    # stage probe).  Widening both sides keeps the stream side wide
    # whichever side the planner builds; no-op at scale (see helper).
    part = widen_if_narrow(
        table(spark, sf_dir, "part").selectExpr(
            "p_partkey", "p_name", "split(p_name, ' ')[0] AS blk"
        ),
        spark,
    )
    a = part.selectExpr("p_partkey AS key1", "p_name AS name1", "blk")
    c = part.selectExpr("p_partkey AS key2", "p_name AS name2", "blk")
    return (
        a.join(c, "blk")
        .filter(F.col("key1") < F.col("key2"))
        .withColumn("dist", F.levenshtein("name1", "name2").cast("long"))
        .filter((F.col("dist") >= 1) & (F.col("dist") <= _FUZZ_MAX))
        .select("key1", "key2", "name1", "name2", "dist")
    )


# ---------------------------------------------------------------------------
# entity-resolution pipeline: fuzzy pairs -> connected components ->
# canonical entities.  The E2E composition of the linkage stages, the
# same blocked-candidates + hash-min-CC shape the dedup family uses for
# documents, here resolving part records by near-identical names.
# ---------------------------------------------------------------------------

_ER_EDGES_DUCK = f"""
SELECT a.p_partkey AS key1, c.p_partkey AS key2
{_FUZZ_JOIN_DUCK}
"""


@register(
    "pipeline_entity_resolution",
    oracle=f"""
WITH RECURSIVE pairs AS ({_ER_EDGES_DUCK}),
edges AS (
  SELECT key1 AS a, key2 AS b FROM pairs
  UNION ALL
  SELECT key2 AS a, key1 AS b FROM pairs
),
reach(node, r) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
cc AS (SELECT node, MIN(r) AS entity FROM reach GROUP BY node)
SELECT cc.entity AS entity_id,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       MIN(p.p_name) AS canonical_name
FROM cc JOIN part p ON p.p_partkey = cc.node
GROUP BY cc.entity
HAVING COUNT(*) >= 2
""",
    tags=("linkage", "pipeline"),
)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2E entity resolution over part records: blocked fuzzy pairs
    (linkage_fuzzy_name_pairs) -> hash-min connected components
    (operators/graph.py, O(diameter) checkpointed rounds) -> canonical
    entity rollup (size >= 2 — singletons are already resolved).  Every
    stage is itself an oracle-checked operator; the composition gets its
    own full-value oracle (recursive-CTE closure on the DuckDB side)."""
    from copperhead_spark.operators.graph import connected_components

    parts = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = linkage_fuzzy_name_pairs(spark, sf_dir).select("key1", "key2")
    cc = connected_components(
        parts.select("p_partkey"),
        pairs,
        node_col="p_partkey",
        src_col="key1",
        dst_col="key2",
        component_col="entity",
    )
    return (
        cc.join(parts, "p_partkey")
        .groupBy(F.col("entity").alias("entity_id"))
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.min("p_name").alias("canonical_name"),
        )
        .filter(F.col("n_records") >= 2)
    )

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
