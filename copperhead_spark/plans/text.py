"""Text-analysis operator family (mandated beyond-reference capability):
token counting, quality scoring, language-ID heuristic.

All string math is engine-portable (split / length / filter counts /
double divisions of integers), so every query is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.functions.exact import exact_sum, exact_sum_sql
from copperhead_spark.plans.registry import register

_STOPWORDS = ("the", "a")
_STOP_PRED = " OR ".join(f"w = '{s}'" for s in _STOPWORDS)


@register(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
       CAST(length(text) AS BIGINT) AS n_chars_obs,
       CAST(len(regexp_extract_all(text, '[a-z]+[0-9]*')) AS BIGINT) AS n_bpe_ish
FROM documents
""",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, unique tokens, chars, and a
    BPE-ish regex token count (letter runs + optional digits)."""
    docs = table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_unique",
        "CAST(length(text) AS BIGINT) AS n_chars_obs",
        "CAST(size(regexp_extract_all(text, '[a-z]+[0-9]*', 0)) AS BIGINT) AS n_bpe_ish",
    )


_QUALITY_SPARK = f"""
CAST(size(filter(split(text, ' '), w -> {_STOP_PRED})) AS DOUBLE)
  / CAST(size(split(text, ' ')) AS DOUBLE)
"""

_QUALITY_DUCK = f"""
CAST(len(list_filter(string_split(text, ' '), w -> {_STOP_PRED})) AS DOUBLE)
  / CAST(len(string_split(text, ' ')) AS DOUBLE)
"""


@register(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       {_QUALITY_DUCK} AS stop_ratio,
       CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)
         AS mean_token_len,
       0.5 * ({_QUALITY_DUCK})
         + 0.5 * LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE)
                       / CAST(50 AS DOUBLE), CAST(1 AS DOUBLE)) AS quality
FROM documents
""",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, mean token length, and a blended
    length/stopword score — the standard pretraining-corpus filters
    (length / punctuation / stopword heuristics) as pure expressions."""
    docs = table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"{_QUALITY_SPARK} AS stop_ratio",
        "CAST(length(text) AS DOUBLE) / CAST(size(split(text, ' ')) AS DOUBLE)"
        " AS mean_token_len",
        f"0.5 * ({_QUALITY_SPARK})"
        " + 0.5 * LEAST(CAST(size(split(text, ' ')) AS DOUBLE)"
        " / CAST(50 AS DOUBLE), CAST(1 AS DOUBLE)) AS quality",
    )


# language-ID: per-language marker-token ratios, argmax by ordered CASE.
# (The synthetic corpus shares one vocabulary across lang labels, so the
# classifier output is uniform — the operator shape is what's exercised.)
_MARKERS = {
    "en": ("the", "a"),
    "es": ("el", "la"),
    "de": ("der", "die"),
    "fr": ("le", "la"),
}


def _ratio(dialect: str, words: tuple[str, ...]) -> str:
    pred = " OR ".join(f"w = '{s}'" for s in words)
    if dialect == "spark":
        return (
            f"CAST(size(filter(split(text, ' '), w -> {pred})) AS DOUBLE)"
            f" / CAST(size(split(text, ' ')) AS DOUBLE)"
        )
    return (
        f"CAST(len(list_filter(string_split(text, ' '), w -> {pred})) AS DOUBLE)"
        f" / CAST(len(string_split(text, ' ')) AS DOUBLE)"
    )


def _langid_case(dialect: str) -> str:
    ratios = {lang: _ratio(dialect, words) for lang, words in _MARKERS.items()}
    best = " , ".join(ratios.values())
    cases = " ".join(
        f"WHEN GREATEST({best}) > 0 AND ({ratios[lang]}) = GREATEST({best})"
        f" THEN '{lang}'"
        for lang in _MARKERS
    )
    return f"CASE {cases} ELSE 'und' END"


@register(
    "text_lang_id",
    oracle=f"""
SELECT lang, {_langid_case("duck")} AS predicted, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
""",
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-word ratio per language, first
    argmax wins (ordered CASE = deterministic tie-break), confusion
    counts against the labeled lang column."""
    docs = table(spark, sf_dir, "documents")
    return docs.selectExpr("lang", f"{_langid_case('spark')} AS predicted").groupBy(
        "lang", "predicted"
    ).agg(F.count("*").alias("n"))


@register(
    "text_length_by_source",
    oracle=f"""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       {exact_sum_sql("CAST(n_chars AS DOUBLE) / 100", 6)} AS kchars
FROM documents
GROUP BY source, lang
""",
    tags=("text", "A6"),
)
def text_length_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup per (source, lang) — the bookkeeping
    aggregate every data pipeline runs before mixing."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        exact_sum(F.col("n_chars").cast("double") / 100, 6).alias("kchars"),
    )


# ---------------------------------------------------------------------------
# repetition / composite quality filters (MassiveText/Gopher-style rules):
# everything is per-row array math — no shuffle, no UDF; at 100 TB these
# are pure map-side filters that compose with partition pruning.
# ---------------------------------------------------------------------------

# token trigrams as strings.  Spark gotcha: sequence(1, n) DESCENDS when
# n < 1, so the empty case must be guarded explicitly.
_TRI_SPARK = """
CASE WHEN size(split(text, ' ')) >= 3 THEN
  transform(sequence(1, size(split(text, ' ')) - 2),
            i -> concat(element_at(split(text, ' '), i), ' ',
                        element_at(split(text, ' '), i + 1), ' ',
                        element_at(split(text, ' '), i + 2)))
ELSE array() END
"""

_TRI_DUCK = """
list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2])
"""

# fraction of trigram slots occupied by a repeated trigram (0 when the
# doc has < 3 tokens); the within-document repetition signal
_DUPTRI_SPARK = f"""
CASE WHEN size({_TRI_SPARK}) > 0 THEN
  CAST(size({_TRI_SPARK}) - size(array_distinct({_TRI_SPARK})) AS DOUBLE)
    / CAST(size({_TRI_SPARK}) AS DOUBLE)
ELSE CAST(0 AS DOUBLE) END
"""

_DUPTRI_DUCK = f"""
CASE WHEN len({_TRI_DUCK}) > 0 THEN
  CAST(len({_TRI_DUCK}) - len(list_distinct({_TRI_DUCK})) AS DOUBLE)
    / CAST(len({_TRI_DUCK}) AS DOUBLE)
ELSE CAST(0 AS DOUBLE) END
"""

# non [a-z0-9 space] character fraction: stripping the alnum+space class
# leaves exactly the symbol characters, so the ratio is len(stripped)/len
# (DuckDB regexp_replace needs the explicit 'g' flag; Spark's is global
# by default)
_SYMRATIO_SPARK = """
CAST(length(regexp_replace(text, '[a-z0-9 ]', '')) AS DOUBLE)
  / CAST(length(text) AS DOUBLE)
"""
_SYMRATIO_DUCK = """
CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
  / CAST(length(text) AS DOUBLE)
"""


@register(
    "text_repetition_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TRI_DUCK}) AS BIGINT) AS n_trigrams,
       {_DUPTRI_DUCK} AS dup_trigram_fraction,
       CAST(1 AS DOUBLE)
         - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) AS alnum_space_ratio
FROM documents
""",
    tags=("text",),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals: token-trigram count, repeated-
    trigram fraction (MassiveText 'duplicate n-gram fraction' rule), and
    alphanumeric character ratio.  Pure array expressions — zero shuffle,
    whole plan is one map stage over the scan."""
    docs = table(spark, sf_dir, "documents")
    return _doc_stats(docs, ["doc_id"]).selectExpr(
        "doc_id",
        "n_tri AS n_trigrams",
        "dup AS dup_trigram_fraction",
        "CAST(1 AS DOUBLE) - sym AS alnum_space_ratio",
    )


# Spark execution path for the repetition/quality scalars: the naive
# inline form re-evaluates split(text) INSIDE the trigram lambda (once
# per element, interpreted — measured 2.5 ms/doc); materializing tokens,
# then trigrams, behind successive Generate barriers makes each array
# compute once per row.  Still zero shuffle — barriers are map-side.
def _doc_stats(docs: DataFrame, keep: list[str]) -> DataFrame:
    from copperhead_spark.operators.barrier import project_once

    toks = project_once(docs, *keep, "text", "split(text, ' ') AS toks")
    tri = project_once(
        toks,
        *keep,
        "text",
        "toks",
        """
CASE WHEN size(toks) >= 3 THEN
  transform(sequence(1, size(toks) - 2),
            i -> concat(element_at(toks, i), ' ',
                        element_at(toks, i + 1), ' ',
                        element_at(toks, i + 2)))
ELSE array() END AS tri
""",
    )
    return tri.selectExpr(
        *keep,
        "CAST(size(toks) AS DOUBLE) AS ntok",
        "CAST(size(tri) AS BIGINT) AS n_tri",
        "CAST(length(text) AS DOUBLE) / CAST(size(toks) AS DOUBLE) AS mtl",
        f"{_SYMRATIO_SPARK} AS sym",
        "CASE WHEN size(tri) > 0 THEN"
        " CAST(size(tri) - size(array_distinct(tri)) AS DOUBLE)"
        " / CAST(size(tri) AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS dup",
    )


# the same rule set over _doc_stats scalar columns (Spark execution path)
_GOPHER_SCALAR_PASS = (
    "(ntok >= 10 AND ntok <= 1000 AND mtl >= 3 AND mtl <= 12"
    " AND sym <= 0.2 AND dup <= 0.3)"
)


# composite pass/fail rule set (Gopher-style): token-count window, mean
# token length window, symbol ratio cap, repetition cap
def _gopher_pass(dialect: str) -> str:
    if dialect == "spark":
        ntok = "CAST(size(split(text, ' ')) AS DOUBLE)"
        mtl = f"CAST(length(text) AS DOUBLE) / {ntok}"
        dup, sym = _DUPTRI_SPARK, _SYMRATIO_SPARK
    else:
        ntok = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
        mtl = f"CAST(length(text) AS DOUBLE) / {ntok}"
        dup, sym = _DUPTRI_DUCK, _SYMRATIO_DUCK
    return (
        f"({ntok} >= 10 AND {ntok} <= 1000"
        f" AND {mtl} >= 3 AND {mtl} <= 12"
        f" AND ({sym}) <= 0.2"
        f" AND ({dup}) <= 0.3)"
    )


@register(
    "text_gopher_filter",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE {_gopher_pass("duck")}) AS BIGINT) AS n_pass,
       CAST(COUNT(*) FILTER (WHERE {_gopher_pass("duck")}) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS pass_rate
FROM documents
GROUP BY source
""",
    tags=("text",),
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite corpus-quality gate (Gopher-style rule set): token-count
    window, mean-token-length window, symbol-ratio cap, repeated-trigram
    cap — reported as per-source pass rates.  The predicate itself is a
    pure row filter; only the audit rollup shuffles (on the low-
    cardinality source key)."""
    docs = table(spark, sf_dir, "documents")
    stats = _doc_stats(docs, ["source"])
    passed = F.expr(_GOPHER_SCALAR_PASS)
    return stats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(passed).alias("n_pass"),
        (F.count_if(passed).cast("double") / F.count("*").cast("double")).alias(
            "pass_rate"
        ),
    )


# ---------------------------------------------------------------------------
# deterministic sampling / dataset splits (training-data pipeline ops):
# RNG-based sample() is irreproducible across engines, partitionings and
# reruns; keying a hash uniform on the stable doc_id makes the sample a
# pure filter — reproducible, oracle-checkable, and pushdown-friendly.
# ---------------------------------------------------------------------------

from copperhead_spark.operators.rochester import hash_uniform_sql  # noqa: E402

_SPLIT_U = hash_uniform_sql("doc_id", "7919")
_SAMPLE_RATES = {"web": 0.5, "books": 0.9, "wiki": 1.0, "code": 0.25}

_SAMPLE_RATE_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in _SAMPLE_RATES.items())
    + " ELSE 0.1 END"
)


@register(
    "text_sample_stratified",
    oracle=f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled, MIN(doc_id) AS first_doc
FROM documents
WHERE {_SPLIT_U} < {_SAMPLE_RATE_CASE}
GROUP BY source
""",
    tags=("text", "sampling"),
)
def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-source keep rates applied
    as a hash-uniform filter on the stable key — same rows on every
    engine, every partitioning, every rerun (RNG sample() is none of
    those).  The filter is a pure row predicate: no shuffle, and at
    100 TB it composes with partition pruning."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(F.expr(f"{_SPLIT_U} < {_SAMPLE_RATE_CASE}"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("first_doc"))
    )


@register(
    "text_train_val_test_split",
    oracle=f"""
SELECT CASE WHEN {_SPLIT_U} < 0.8 THEN 'train'
            WHEN {_SPLIT_U} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
""",
    tags=("text", "sampling"),
)
def text_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from the same hash uniform:
    membership is a pure function of the row key, so the split is stable
    under re-partitioning, incremental appends, and engine changes —
    the property randomSplit() does not have."""
    docs = table(spark, sf_dir, "documents")
    split = (
        f"CASE WHEN {_SPLIT_U} < 0.8 THEN 'train' "
        f"WHEN {_SPLIT_U} < 0.9 THEN 'val' ELSE 'test' END"
    )
    return (
        docs.selectExpr(f"{split} AS split", "text")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# end-to-end corpus curation: the training-data pipeline as ONE query —
# quality gate -> near-dup removal (LSH candidates -> connected
# components -> keep cluster canonicals) -> deterministic train/val/test
# split -> composition audit.  Every stage is an already-oracle-checked
# operator; this registers their composition so the full pipeline
# (filters + iterative clustering + split + rollup) faces one oracle.
# ---------------------------------------------------------------------------


def _curation_oracle() -> str:
    from copperhead_spark.plans.dedup import _CC_ORACLE

    split = (
        f"CASE WHEN {_SPLIT_U} < 0.8 THEN 'train' "
        f"WHEN {_SPLIT_U} < 0.9 THEN 'val' ELSE 'test' END"
    )
    return f"""
WITH cc AS ({_CC_ORACLE})
SELECT source, {split} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents JOIN cc USING (doc_id)
WHERE {_gopher_pass("duck")} AND doc_id = component
GROUP BY 1, 2
"""


@register("pipeline_corpus_curation", oracle=_curation_oracle(), tags=("text", "dedup"))
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: Gopher-style quality gate, near-dup
    removal keeping one canonical doc per connected component of the
    LSH candidate graph, deterministic 80/10/10 split, rolled up per
    (source, split).  Plan shape at 100 TB: the quality gate and split
    are zero-shuffle row predicates; dedup costs the LSH banding
    shuffle + O(diameter) propagation rounds; the final rollup is one
    partial-agg groupBy on a tiny key space."""
    from copperhead_spark.plans.dedup import dedup_connected_components

    docs = table(spark, sf_dir, "documents")
    cc = dedup_connected_components(spark, sf_dir)
    split = (
        f"CASE WHEN {_SPLIT_U} < 0.8 THEN 'train' "
        f"WHEN {_SPLIT_U} < 0.9 THEN 'val' ELSE 'test' END"
    )
    stats = _doc_stats(docs, ["doc_id", "source", "length(text) AS _len"])
    return (
        stats.filter(F.expr(_GOPHER_SCALAR_PASS))
        .join(cc, "doc_id")
        .filter(F.col("doc_id") == F.col("component"))
        .selectExpr("source", f"{split} AS split", "_len")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_len").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# PII / URL scrubbing (the redaction stage of corpus curation): span
# counting + redacted text.  Patterns are written in the common subset of
# RE2 (DuckDB) and Java regex (Spark) — no backrefs, no lookaround — so
# one pattern string drives both engines; the semantic unit test
# (tests/test_operators.py) pins the behavior on crafted strings since
# the synthetic corpus itself is clean.
# ---------------------------------------------------------------------------

# [.] instead of \. — Spark SQL string literals process backslash
# escapes (\. collapses to a bare wildcard .) while DuckDB's do not, so
# an escaped dot means DIFFERENT regexes on the two engines; the
# character class is escape-free and identical in both
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
_URL_RE = "https?://[^ ]+"


@register(
    "text_pii_redaction",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_URL_RE}')) AS BIGINT) AS n_urls,
       CAST(length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_URL_RE}', '<URL>', 'g')) AS BIGINT)
         AS redacted_len
FROM documents
""",
    tags=("text",),
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/URL span counts and the redacted-text length.
    Pure regex projection — zero shuffle; at 100 TB this is a map-only
    pass fused into the scan stage."""
    docs = table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"CAST(size(regexp_extract_all(text, '{_EMAIL_RE}', 0)) AS BIGINT) AS n_emails",
        f"CAST(size(regexp_extract_all(text, '{_URL_RE}', 0)) AS BIGINT) AS n_urls",
        f"CAST(length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>'),"
        f" '{_URL_RE}', '<URL>')) AS BIGINT) AS redacted_len",
    )


@register(
    "text_vocab_topk",
    oracle="""
SELECT token, n, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT token, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rn
  FROM (
    SELECT t.token, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, unnest(string_split(text, ' ')) AS t(token)
    GROUP BY t.token
  )
) WHERE rn <= 50
""",
    tags=("text",),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by frequency (tokenizer-training
    prep).  explode -> count is ONE shuffle with map-side partial
    aggregation (token cardinality, not token count, crosses the wire);
    the global top-k runs on the aggregated table, whose size is the
    vocabulary, so the final single-partition sort is safe at any corpus
    scale.  Ties broken by token for cross-engine determinism."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("token", "n", F.col("rn").cast("long").alias("rank"))
    )

# ---------------------------------------------------------------------------
# line/segment-level dedup (boilerplate removal): the corpus-curation op
# that exact/minhash DOC-level dedup misses — headers, nav bars, license
# blurbs repeated across otherwise-distinct documents.  Segments are
# non-overlapping 8-token windows; a segment seen in too many documents
# is boilerplate and gets dropped from every document carrying it.
# ---------------------------------------------------------------------------

_SEG_N = 8
_SEG_MAX_COUNT = 2  # a segment in > 2 docs is boilerplate


def _seg_hashes_spark() -> str:
    """array<bigint> of non-overlapping 8-token window hashes over the
    materialized token-hash array column `_th`.  Windows are addressed by
    explicit element_at (O(1) each); the CASE guard keeps every index in
    range, so no try_* fallback and no ANSI out-of-bounds error.  Token
    hashes < 2^20 and 31^7 < 2^35 keep every term below 2^58: no modulus.
    """
    core = " + ".join(
        f"element_at(_th, (j - 1) * {_SEG_N} + {k + 1}) * {31 ** k}"
        for k in range(_SEG_N)
    )
    return (
        f"filter(transform(sequence(1, CAST(greatest(size(_th) div {_SEG_N}, 1) AS INT)),"
        f" j -> IF(j * {_SEG_N} <= size(_th), {core}, CAST(NULL AS BIGINT))),"
        f" v -> v IS NOT NULL)"
    )


def _seg_hashes_duck() -> str:
    from copperhead_spark.functions.text import token_hashes_duck  # noqa: F401

    core = " + ".join(
        f"th[(j - 1) * {_SEG_N} + {k + 1}] * {31 ** k}" for k in range(_SEG_N)
    )
    return f"list_transform(range(1, len(th) // {_SEG_N} + 1), j -> {core})"


def _line_dedup_oracle() -> str:
    from copperhead_spark.functions.text import token_hashes_duck

    return f"""
WITH th AS (
  SELECT doc_id, {token_hashes_duck("text")} AS th FROM documents
), segs AS (
  SELECT doc_id, unnest({_seg_hashes_duck()}) AS seg_hash FROM th
), counts AS (
  SELECT seg_hash, COUNT(*) AS seg_count FROM segs GROUP BY seg_hash
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN c.seg_count <= {_SEG_MAX_COUNT} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM segs s JOIN counts c USING (seg_hash)
GROUP BY s.doc_id
"""


@register("text_line_dedup", oracle=_line_dedup_oracle(), tags=("text", "dedup"))
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (line-level) dedup: per-document count of segments
    kept after dropping segments that appear in more than
    ``_SEG_MAX_COUNT`` documents corpus-wide.  Two-pass shape (the Dolma
    / CCNet boilerplate-removal pattern): (1) one partial-agg groupBy on
    the segment hash builds the global count table; (2) the exploded
    segment stream joins it on the same hash — both shuffles key on
    seg_hash, so AQE plans them back-to-back without re-partitioning,
    and the doc-level rollup is the only event-keyed exchange."""
    from copperhead_spark.functions.text import token_hashes_spark
    from copperhead_spark.operators.barrier import project_once

    docs = table(spark, sf_dir, "documents")
    th = project_once(docs, "doc_id", f"{token_hashes_spark('text')} AS _th")
    segs = th.selectExpr("doc_id", f"explode({_seg_hashes_spark()}) AS seg_hash")
    counts = segs.groupBy("seg_hash").agg(F.count("*").alias("seg_count"))
    return (
        segs.join(counts, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("seg_count") <= _SEG_MAX_COUNT, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function) — the one Spark API surface the rest of
# the engine doesn't exercise.  Kept to a genuinely row-generating shape:
# context-window chunking of documents (the RAG/embedding preprocessing
# step).  NOTE: Python UDTFs are the slow path (per-row Python); the
# engine's production chunker for this exact shape is the pure-SQL
# explode form (see pack_sequences / mm_frame_sample).  The UDTF is
# registered because the API matters for user-defined operators that
# cannot be expressed as expressions — and even the slow path must be
# oracle-correct.
# ---------------------------------------------------------------------------

_CHUNK_W = 16


@register(
    "udtf_token_chunks",
    oracle=f"""
WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
       array_to_string(toks[(t.i-1)*{_CHUNK_W}+1 : t.i*{_CHUNK_W}], ' ') AS chunk,
       CAST(least({_CHUNK_W}, length(toks) - (t.i-1)*{_CHUNK_W}) AS BIGINT) AS n_tokens
FROM b CROSS JOIN LATERAL (
  SELECT unnest(range(1, CAST(ceil(length(toks)/{float(_CHUNK_W)}) AS BIGINT) + 1)) AS i
) t
""",
    tags=("text", "training", "UDTF"),
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width context chunking as a Python UDTF invoked via LATERAL:
    each document expands to ceil(n_tokens/{_CHUNK_W}) chunk rows.  The
    UDTF runs row-at-a-time in Python workers (Arrow-serialized batches
    in/out) — it parallelizes per-partition and never shuffles, but stays
    ~10-100x slower than the equivalent explode expression; use it for
    logic that genuinely needs Python (custom tokenizers, model-specific
    chunk boundaries)."""
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx bigint, chunk string, n_tokens bigint")
    class TokenChunks:
        def eval(self, doc_id, text):
            toks = (text or "").split(" ")
            for i in range(1, math.ceil(len(toks) / _CHUNK_W) + 1):
                part = toks[(i - 1) * _CHUNK_W : i * _CHUNK_W]
                yield doc_id, i, " ".join(part), len(part)

    spark.udtf.register("cph_token_chunks", TokenChunks)
    table(spark, sf_dir, "documents").createOrReplaceTempView("cph_udtf_docs")
    return spark.sql(
        "SELECT c.* FROM cph_udtf_docs d, LATERAL cph_token_chunks(d.doc_id, d.text) c"
    )


# ---------------------------------------------------------------------------
# PMI term-pair co-occurrence (collocation mining)
# ---------------------------------------------------------------------------

_PMI_VOCAB = 50
_PMI_TOPK = 20

_PMI_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
  FROM documents
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
v50 AS (
  SELECT term, df FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rn FROM df
  ) WHERE rn <= {_PMI_VOCAB}
),
dt AS (SELECT t.doc_id, t.term FROM tok t JOIN v50 ON t.term = v50.term),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
pairs AS (
  SELECT a.term AS u, b.term AS v, CAST(COUNT(*) AS BIGINT) AS c_uv
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
),
scored AS (
  SELECT u, v, c_uv,
         CAST(ROUND(LN(CAST(n_docs * c_uv AS DOUBLE) / (du.df * dv.df)) * 1e9)
              AS BIGINT) AS pmi_e9
  FROM pairs
  JOIN v50 du ON pairs.u = du.term
  JOIN v50 dv ON pairs.v = dv.term
  CROSS JOIN n
)
SELECT u, v, c_uv, pmi_e9 FROM scored
ORDER BY pmi_e9 DESC, u ASC, v ASC LIMIT {_PMI_TOPK}
"""


@register("text_pmi_collocations", oracle=_PMI_ORACLE, tags=("text", "analysis"))
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the top-{_PMI_TOPK} term pairs by pointwise
    mutual information, ln(N * c_uv / (c_u * c_v)), restricted to the
    {_PMI_VOCAB} highest-document-frequency terms.

    Scale design: vocabulary pruning BEFORE pair expansion is the whole
    game — unrestricted per-document pair spaces grow with the square of
    document vocabulary, while the top-V restriction caps every document
    at C(V,2) pairs.  The pruned vocab (V rows) broadcasts to the
    (doc, term) stream; per-document pair expansion is the same
    sorted-set array transform the co-purchase graph uses (map-side,
    no self-join); pair counts are one partial-agg shuffle.  The PMI
    log is rounded through 1e-9 fixed point; the corpus size N is an
    exact integer literal (driver-scalar discipline).

    Reference analogue: none (text-analysis extension; feeds phrase
    vocabularies for tokenizers and quality classifiers)."""
    from copperhead_spark.plans.graph import _PAIRS_UV_SQL

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.selectExpr(
        "doc_id", "explode(filter(split(text, ' '), w -> w != '')) AS term"
    ).distinct()
    df = tok.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    v50 = df.orderBy(F.col("df").desc(), F.col("term").asc()).limit(_PMI_VOCAB)
    dt = tok.join(F.broadcast(v50.select("term")), "term")
    pairs = (
        dt.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("term")).alias("ps"))
        .selectExpr(_PAIRS_UV_SQL)
        .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .agg(F.count("*").cast("long").alias("c_uv"))
    )
    scored = (
        pairs.join(F.broadcast(v50.selectExpr("term AS u", "df AS du")), "u")
        .join(F.broadcast(v50.selectExpr("term AS v", "df AS dv")), "v")
        .selectExpr(
            "u",
            "v",
            "c_uv",
            f"CAST(ROUND(LN(CAST({n_docs} * c_uv AS DOUBLE) / (du * dv)) * 1e9)"
            " AS BIGINT) AS pmi_e9",
        )
    )
    return scored.orderBy(
        F.col("pmi_e9").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_PMI_TOPK)


# ---------------------------------------------------------------------------
# classifier evaluation: confusion-derived precision / recall / F1
# ---------------------------------------------------------------------------


def _f1_oracle() -> str:
    return f"""
WITH conf AS (
  SELECT lang AS actual, {_langid_case("duck")} AS predicted,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
cls AS (
  SELECT actual AS cls FROM conf UNION SELECT predicted FROM conf
),
m AS (
  SELECT cls,
         CAST(COALESCE(SUM(CASE WHEN actual = cls AND predicted = cls THEN n END), 0)
           AS BIGINT) AS tp,
         CAST(COALESCE(SUM(CASE WHEN actual <> cls AND predicted = cls THEN n END), 0)
           AS BIGINT) AS fp,
         CAST(COALESCE(SUM(CASE WHEN actual = cls AND predicted <> cls THEN n END), 0)
           AS BIGINT) AS fn
  FROM cls CROSS JOIN conf GROUP BY cls
),
pr AS (
  SELECT cls, tp, fp, fn,
         CAST(CASE WHEN tp + fp > 0 THEN (tp * 1000000) // (tp + fp) ELSE 0 END
           AS BIGINT) AS prec_e6,
         CAST(CASE WHEN tp + fn > 0 THEN (tp * 1000000) // (tp + fn) ELSE 0 END
           AS BIGINT) AS rec_e6
  FROM m
)
SELECT cls, tp, fp, fn, prec_e6, rec_e6,
       CAST(CASE WHEN prec_e6 + rec_e6 > 0
            THEN (2 * prec_e6 * rec_e6) // (prec_e6 + rec_e6) ELSE 0 END
         AS BIGINT) AS f1_e6
FROM pr ORDER BY cls
"""


@register("ml_confusion_f1", oracle=_f1_oracle(), tags=("ml", "evaluation", "text"))
def ml_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the language-ID heuristic
    against the labeled lang column, derived entirely from the confusion
    matrix in exact 1e-6 fixed point (F1 computed on the fixed-point
    precision/recall, so the whole report is bit-reproducible).
    Completes the in-engine evaluation suite beside ml_auc_rank
    (threshold-free ranking metric) with the thresholded-classifier
    metrics.

    Scale design: the only data-sized pass is the confusion-matrix
    partial aggregation (|classes|^2 cells out of 100 TB of rows); the
    class roster, one-vs-rest sums, and the fixed-point ratios all run
    on those cells.  The oracle's CROSS JOIN of roster x cells is
    |classes|^3-bounded — metadata both ways; Spark derives the same
    one-vs-rest sums by exploding each cell to its (actual, predicted)
    class memberships.

    Reference analogue: extends F1/F2's scorers with the metric the
    reference computes offline."""
    docs = table(spark, sf_dir, "documents")
    conf = (
        docs.selectExpr("lang AS actual", f"{_langid_case('spark')} AS predicted")
        .groupBy("actual", "predicted")
        .agg(F.count("*").cast("long").alias("n"))
    )
    # no roster join needed: each cell credits its actual-class row
    # (tp on a hit, fn on a miss) and, on a miss, an fp row for the
    # predicted class — exploding to <= 2 rows per cell covers every
    # class that appears in either column
    contrib = conf.selectExpr(
        """explode(concat(
             array(named_struct(
               'cls', actual,
               'tp', IF(actual = predicted, n, CAST(0 AS BIGINT)),
               'fp', CAST(0 AS BIGINT),
               'fn', IF(actual = predicted, CAST(0 AS BIGINT), n))),
             IF(actual = predicted,
                array(),
                array(named_struct('cls', predicted,
                                   'tp', CAST(0 AS BIGINT),
                                   'fp', n,
                                   'fn', CAST(0 AS BIGINT))))
           )) AS c"""
    )
    m = contrib.groupBy(F.col("c.cls").alias("cls")).agg(
        F.sum("c.tp").cast("long").alias("tp"),
        F.sum("c.fp").cast("long").alias("fp"),
        F.sum("c.fn").cast("long").alias("fn"),
    )
    pr = m.selectExpr(
        "cls",
        "tp",
        "fp",
        "fn",
        "CAST(IF(tp + fp > 0, (tp * 1000000) DIV (tp + fp), 0) AS BIGINT) AS prec_e6",
        "CAST(IF(tp + fn > 0, (tp * 1000000) DIV (tp + fn), 0) AS BIGINT) AS rec_e6",
    )
    return pr.selectExpr(
        "cls",
        "tp",
        "fp",
        "fn",
        "prec_e6",
        "rec_e6",
        "CAST(IF(prec_e6 + rec_e6 > 0,"
        " (2 * prec_e6 * rec_e6) DIV (prec_e6 + rec_e6), 0) AS BIGINT) AS f1_e6",
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# sentence segmentation stats (the doc-structure profile readability /
# chunking policies read): regex sentence split, non-empty after trim.
# ---------------------------------------------------------------------------


@register(
    "text_sentence_stats",
    oracle="""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '[.!?]'),
                                    x -> trim(x)),
                     x -> length(x) > 0) AS sents
  FROM documents
)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sentences,
       CAST(list_aggregate(list_transform(sents, x -> length(x)), 'sum')
         AS BIGINT) AS total_chars,
       CAST(list_aggregate(list_transform(sents,
            x -> len(string_split(x, ' '))), 'max') AS BIGINT)
         AS max_sentence_tokens
FROM s WHERE len(sents) > 0
""",
    tags=("text",),
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence profile: split on terminal punctuation
    ([.!?] — the common RE2/Java regex subset, same rule as the PII
    patterns), trim, drop empties; emit sentence count, surviving
    character mass, and the longest sentence's token count (the number
    a chunking policy keys on).  Pure array-HOF projection — map-only,
    fused into the scan, zero shuffle at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    s = docs.selectExpr(
        "doc_id",
        "filter(transform(split(text, '[.!?]'), x -> trim(x)),"
        " x -> length(x) > 0) AS sents",
    ).filter(F.expr("size(sents) > 0"))
    return s.selectExpr(
        "doc_id",
        "CAST(size(sents) AS BIGINT) AS n_sentences",
        "CAST(aggregate(transform(sents, x -> length(x)),"
        " CAST(0 AS BIGINT), (a, v) -> a + v) AS BIGINT) AS total_chars",
        "CAST(array_max(transform(sents, x -> size(split(x, ' '))))"
        " AS BIGINT) AS max_sentence_tokens",
    )


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV rate (tokenizer-eval op): what fraction of
# the corpus' token stream falls outside the top-K vocabulary.
# ---------------------------------------------------------------------------

_OOV_VOCAB_K = 50


@register(
    "text_oov_rate",
    oracle=f"""
WITH counts AS (
  SELECT t.token, COUNT(*) AS n
  FROM documents, unnest(string_split(text, ' ')) AS t(token)
  GROUP BY t.token
),
vocab AS (
  SELECT token FROM counts
  ORDER BY n DESC, token ASC LIMIT {_OOV_VOCAB_K}
),
tok AS (
  SELECT d.source, t.token
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE token NOT IN (SELECT token FROM vocab))
         AS BIGINT) AS n_oov,
       CAST((COUNT(*) FILTER (WHERE token NOT IN (SELECT token FROM vocab)))
         * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
FROM tok GROUP BY source
""",
    tags=("text", "tokenize"),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus' own top-
    {_OOV_VOCAB_K} vocabulary (count desc, token asc tie-break — the
    text_vocab_topk ordering): the number a tokenizer/vocab-size
    decision reads.  Two passes over the token stream: (1) one
    partial-agg groupBy(token) whose top-K runs on the aggregated
    vocabulary table (TakeOrderedAndProject), (2) a map-side membership
    test against the BROADCAST K-row vocab + one groupBy(source) — the
    corpus token stream itself is never shuffled in pass 2, so the plan
    holds at 100 TB with any K that fits a broadcast."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    vocab = (
        counts.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(_OOV_VOCAB_K)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    flagged = tok.join(F.broadcast(vocab), "token", "left")
    oov = F.col("_in_vocab").isNull().cast("long")
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(oov).cast("long").alias("n_oov"),
        F.expr("CAST(sum(CAST(_in_vocab IS NULL AS BIGINT)) * 1000000"
               " DIV count(*) AS BIGINT)").alias("oov_ppm"),
    )

# ---------------------------------------------------------------------------
# URL canonicalization + dedup: the crawl-curation step that collapses
# scheme-case / www / default-port / utm-tracking / fragment variants of
# the same page before any content dedup runs (a large crawl's rawest
# duplicate source).  The corpus has no URLs, so each doc synthesizes a
# messy variant deterministically (the WAV payload-construction
# precedent) and the oracle recomputes the same canonicalization with
# DuckDB's string/list functions — value parity proves the ALGORITHM,
# not a shared implementation.
# ---------------------------------------------------------------------------

# raw URL: scheme case flips by doc parity; host mixes case and carries
# www. + the https default port; path has a trailing slash; the query
# mixes utm_* junk with a real param; fragment varies per doc
_URL_RAW_SPARK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,"
    " 'WWW.Example-', source, '.COM:443/articles/',"
    " CAST(doc_id % 50 AS STRING), '/?utm_source=feed&utm_id=',"
    " CAST(doc_id AS STRING), '&ref=', lang, '#frag-', CAST(doc_id AS STRING))"
)
_URL_RAW_DUCK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,"
    " 'WWW.Example-', source, '.COM:443/articles/',"
    " CAST(doc_id % 50 AS VARCHAR), '/?utm_source=feed&utm_id=',"
    " CAST(doc_id AS VARCHAR), '&ref=', lang, '#frag-', CAST(doc_id AS VARCHAR))"
)

_URL_ORACLE = f"""
WITH raw AS (SELECT doc_id, {_URL_RAW_DUCK} AS url FROM documents),
s1 AS (  -- strip fragment, split off the fixed-length scheme
  SELECT doc_id, url, split_part(url, '#', 1) AS nofrag FROM raw
),
s2 AS (
  SELECT doc_id, url,
         split_part(substring(nofrag, 9), '/', 1) AS hostport,
         substring(substring(nofrag, 9), length(split_part(substring(nofrag, 9), '/', 1)) + 1) AS rest
  FROM s1
),
s3 AS (
  SELECT doc_id, url,
         regexp_replace(replace(lower(hostport), ':443', ''), '^www[.]', '') AS host,
         split_part(rest, '?', 1) AS path0,
         CASE WHEN strpos(rest, '?') > 0
              THEN substring(rest, strpos(rest, '?') + 1) ELSE '' END AS query
  FROM s2
),
s4 AS (
  SELECT doc_id, url, host,
         CASE WHEN length(path0) > 1 AND ends_with(path0, '/')
              THEN substring(path0, 1, length(path0) - 1) ELSE path0 END AS path,
         array_to_string(list_filter(string_split(query, '&'),
                                     x -> NOT starts_with(x, 'utm_')), '&') AS q
  FROM s3
),
canon AS (
  SELECT doc_id, url,
         concat('https://', host, path,
                CASE WHEN q <> '' THEN concat('?', q) ELSE '' END) AS canonical
  FROM s4
)
SELECT canonical,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
       MIN(doc_id) AS representative
FROM canon GROUP BY canonical
"""


@register("text_url_canonicalize", oracle=_URL_ORACLE, tags=("text", "dedup", "M5"))
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + exact dedup on the canonical form: strip
    the fragment, lowercase scheme+host, drop the https default port and
    the www. prefix, strip the trailing slash, and remove utm_* tracking
    params while preserving real ones (order-preserving list filter) —
    then group raw variants per canonical URL.  Everything is built-in
    string/array functions (one map-side projection + one groupBy on the
    canonical key), so the 100 TB crawl canonicalizes inside the scan
    with whole-stage codegen and shuffles once on the canonical URL —
    the same plan shape as dedup_exact_groups."""
    docs = table(spark, sf_dir, "documents")
    raw = docs.selectExpr("doc_id", f"{_URL_RAW_SPARK} AS url")
    s1 = raw.selectExpr("doc_id", "url", "substring_index(url, '#', 1) AS nofrag")
    s2 = s1.selectExpr(
        "doc_id",
        "url",
        "substring_index(substring(nofrag, 9), '/', 1) AS hostport",
        "substring(substring(nofrag, 9),"
        " length(substring_index(substring(nofrag, 9), '/', 1)) + 1) AS rest",
    )
    s3 = s2.selectExpr(
        "doc_id",
        "url",
        "regexp_replace(replace(lower(hostport), ':443', ''), '^www[.]', '') AS host",
        "substring_index(rest, '?', 1) AS path0",
        "CASE WHEN instr(rest, '?') > 0"
        " THEN substring(rest, instr(rest, '?') + 1) ELSE '' END AS query",
    )
    s4 = s3.selectExpr(
        "doc_id",
        "url",
        "host",
        "CASE WHEN length(path0) > 1 AND endswith(path0, '/')"
        " THEN substring(path0, 1, length(path0) - 1) ELSE path0 END AS path",
        "array_join(filter(split(query, '&'),"
        " x -> NOT startswith(x, 'utm_')), '&') AS q",
    )
    canon = s4.selectExpr(
        "doc_id",
        "url",
        "concat('https://', host, path,"
        " CASE WHEN q != '' THEN concat('?', q) ELSE '' END) AS canonical",
    )
    return canon.groupBy("canonical").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("url").cast("long").alias("n_raw_variants"),
        F.min("doc_id").alias("representative"),
    )


from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
