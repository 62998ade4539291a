"""Tokenizer application at corpus scale: encode every document with a
trained BPE merge table (the inference half of the tokenizer; the
training half is plans/linkage.py text_bpe_train_merges).

Two registered encoders over the same semantics:

- ``text_bpe_encode`` — the PRODUCTION shape: a 1000-rank merge table
  applied by the Arrow mapInPandas kernel (operators/bpe.py) over the
  DISTINCT-word vocabulary, merge list shipped as a SparkContext
  broadcast, encodings broadcast-joined back onto the positional token
  stream.  Rank count moves a Python loop bound, not the Catalyst plan
  depth, so this is the form that survives a realistic ~30k-rank trained
  table.  The DuckDB oracle iterates the SAME 1000 ranks with a
  recursive CTE over the vocabulary (working set = vocab x ranks — fine
  at oracle scale, and the oracle only ever runs at small sf).

- ``text_bpe_encode_expr8`` — the expression-form twin at the 8-rank
  toy table: one nested aggregate() layer per rank, fully inside
  whole-stage codegen.  Exact at small rank count and pinned equal to
  the kernel on the same table (tests/test_round4_regressions.py), but
  the unroll cannot scale in rank — which is WHY the kernel exists.

Everything downstream of the vocab encode is array expressions
(order-preserving on both engines — no unnest/explode reassembly
ambiguity), and the output is integers only: token count, merged-token
count, and an order-SENSITIVE polynomial rolling hash of the full token
sequence, so the oracle check proves the exact token *sequence* agrees,
not just its length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.operators.bpe import encode_vocab_arrow
from copperhead_spark.plans.linkage import (
    _bpe_chars_duck,
    _bpe_merge_duck,
    _bpe_merge_spark,
    _sql_str,
)
from copperhead_spark.plans.registry import register

# ranked merge table (rank order = application order), the literal
# stand-in for text_bpe_train_merges output: common English digraphs.
_MERGES = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("e", "d"),
    ("s", "t"),
)


def _make_merges_1k(n: int = 1000) -> tuple[tuple[str, str], ...]:
    """Deterministic 1000-rank merge table: the 8 real digraphs first
    (so the table's head matches the toy twin), then letter-letter pairs
    in frequency order, then (digraph, letter) ranks that reference
    tokens earlier ranks created — the compositional shape of a real
    trained table.  Pure function of constants: the Spark kernel and the
    DuckDB oracle literal are built from the same tuple."""
    freq = "etaoinsrhldcumfpgwybvkxjqz"
    out: list[tuple[str, str]] = list(_MERGES)
    seen = set(out)
    for a in freq:
        for b in freq:
            if len(out) >= n:
                break
            if (a, b) not in seen:
                seen.add((a, b))
                out.append((a, b))
        if len(out) >= n:
            break
    digraphs = [left + right for left, right in out[: len(_MERGES) + 50]]
    for d in digraphs:
        for c in freq:
            if len(out) >= n:
                break
            if (d, c) not in seen:
                seen.add((d, c))
                out.append((d, c))
        if len(out) >= n:
            break
    return tuple(out[:n])


_MERGES_1K = _make_merges_1k()

_HASH_P = 2_147_483_647  # Mersenne prime; fits products in int64


def _encode_word_spark(w: str) -> str:
    syms = f"split({w}, '')"
    for left, right in _MERGES:
        syms = _bpe_merge_spark(syms, _sql_str(left), _sql_str(right))
    return syms


def _encode_word_duck(w: str) -> str:
    syms = _bpe_chars_duck(w)
    for left, right in _MERGES:
        syms = _bpe_merge_duck(syms, f"'{left}'", f"'{right}'")
    return syms


# token -> int: polynomial fold of character codes (base 31); sequence
# hash: polynomial fold of token hashes (base 131).  Identical integer
# arithmetic on both engines, mod a Mersenne prime so acc*131 stays in
# int64.
def _tok_hash_spark(t: str) -> str:
    return (
        f"aggregate(split({t}, ''), CAST(7 AS BIGINT),"
        f" (a, c) -> pmod(a * 31 + ascii(c), {_HASH_P}))"
    )


def _tok_hash_duck(t: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(7 AS BIGINT),"
        f" list_transform({_bpe_chars_duck(t)}, c -> CAST(ord(c) AS BIGINT))),"
        f" (a, c) -> (a * 31 + c) % {_HASH_P})"
    )


def _seq_hash_duck(toks: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({toks}, t -> {_tok_hash_duck('t')})),"
        f" (a, h) -> (a * 131 + h) % {_HASH_P})"
    )


_ENC_ORACLE_EXPR8 = f"""
WITH enc AS (
  SELECT doc_id,
         flatten(list_transform(
             list_filter(string_split(text, ' '), w -> w <> ''),
             w -> {_encode_word_duck('w')})) AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, t -> length(t) > 1)) AS BIGINT) AS n_merged,
       {_seq_hash_duck('toks')} AS seq_hash
FROM enc
"""


def _merges_values_sql(merges: tuple[tuple[str, str], ...]) -> str:
    rows = ", ".join(
        f"({i + 1}, '{left}', '{right}')"
        for i, (left, right) in enumerate(merges)
    )
    return f"(VALUES {rows})"


def _enc_oracle_from_merges(merges_ctes: str, n_ranks: int) -> str:
    """Recursive-CTE encode oracle over an arbitrary ranked merge TABLE:
    ``merges_ctes`` must define a CTE ``merges(rank, ml, mr)`` (plus any
    CTEs it needs — e.g. the trainer's own rounds).  The recursion steps
    the vocabulary through the ranks one per iteration (the same
    left-to-right fold per rank), then encodings join back onto the
    positional token stream and reassemble per doc in order.  Working
    set is vocab x ranks rows — an oracle-scale formulation (the
    production engine never materializes per-rank states), which is
    exactly its job."""
    return f"""
WITH RECURSIVE
{merges_ctes},
words AS (
  SELECT DISTINCT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
  FROM documents
),
enc(w, syms, rank) AS (
  SELECT w, {_bpe_chars_duck('w')}, 0 FROM words
  UNION ALL
  SELECT e.w, {_bpe_merge_duck('e.syms', 'm.ml', 'm.mr')}, e.rank + 1
  FROM enc e JOIN merges m ON m.rank = e.rank + 1
),
vocab AS (
  SELECT w,
         CAST(len(syms) AS BIGINT) AS nt,
         CAST(len(list_filter(syms, t -> length(t) > 1)) AS BIGINT) AS nm,
         list_transform(syms, t -> {_tok_hash_duck('t')}) AS hs
  FROM enc WHERE rank = {n_ranks}
),
docs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos FROM docs
),
perdoc AS (
  SELECT t.doc_id,
         CAST(SUM(v.nt) AS BIGINT) AS n_tokens,
         CAST(SUM(v.nm) AS BIGINT) AS n_merged,
         flatten(list(v.hs ORDER BY t.pos)) AS hsall
  FROM tok t JOIN vocab v USING (w)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_merged, 0) AS n_merged,
       COALESCE(list_reduce(list_prepend(CAST(0 AS BIGINT), p.hsall),
                            (a, h) -> (a * 131 + h) % {_HASH_P}), 0) AS seq_hash
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""


# 1000-rank oracle: the literal merge table through the recursive encode
_ENC_ORACLE_1K = _enc_oracle_from_merges(
    f"merges(rank, ml, mr) AS (SELECT * FROM {_merges_values_sql(_MERGES_1K)} v)",
    len(_MERGES_1K),
)


def _token_stream(spark: SparkSession, sf_dir: str):
    """(docs, positional token stream): one row per non-empty word with
    its position.  Empty words (split artifacts of consecutive/leading/
    trailing spaces) are DROPPED on both engines: Spark's split('', '')
    yields [''] where DuckDB's chars('') yields [], so the empty word is
    the one input the two merge folds disagree on — excluding it pins
    the semantics (tokens come from non-empty words only)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.selectExpr(
        "doc_id", "posexplode(split(text, ' ')) AS (pos, w)"
    ).filter("w <> ''")
    return docs, tok


def _assemble_per_doc(docs: DataFrame, tok: DataFrame, vocab: DataFrame) -> DataFrame:
    """Broadcast-join per-word encodings back onto the positional stream
    and reassemble per doc in position order.  A doc whose text is all
    spaces has no non-empty words: keep it in the output with the empty
    encoding (0 tokens, fold seed hash 0), matching the oracle's per-doc
    row."""
    joined = tok.join(F.broadcast(vocab), "w")
    per = (
        joined.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("pos"), F.col("nt"), F.col("nm"), F.col("hs"))
                )
            ).alias("parts")
        )
        .selectExpr(
            "doc_id",
            "CAST(aggregate(parts, CAST(0 AS BIGINT), (a, p) -> a + p.nt) AS BIGINT)"
            " AS n_tokens",
            "CAST(aggregate(parts, CAST(0 AS BIGINT), (a, p) -> a + p.nm) AS BIGINT)"
            " AS n_merged",
            "aggregate(flatten(transform(parts, p -> p.hs)), CAST(0 AS BIGINT),"
            f" (a, h) -> pmod(a * 131 + h, {_HASH_P})) AS seq_hash",
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_merged", F.lit(0)).alias("n_merged"),
            F.coalesce("seq_hash", F.lit(0)).alias("seq_hash"),
        )
    )


@register("text_bpe_encode", oracle=_ENC_ORACLE_1K, tags=("text", "tokenizer"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the {len(_MERGES_1K)}-rank merge table
    via the Arrow kernel (operators/bpe.py): distinct words encode once
    per vocabulary entry (vocabulary factorization — measured 8.4s ->
    sub-second at sf0.1 when it replaced the direct per-token fold; at
    100 TB the vocab is millions of words while the stream is trillions
    of tokens, so the same factorization only gets better), the merge
    list ships as ONE broadcast per executor, and per-word results
    broadcast-join back onto the positional stream.  Returns (doc_id,
    n_tokens, n_merged, seq_hash) where seq_hash is an order-sensitive
    polynomial hash over per-token character-code hashes — bit-equal
    hashes mean bit-equal token sequences, here proven at production
    rank count against a recursive-CTE DuckDB oracle stepping the same
    1000 ranks.  Reference analogue: none (beyond-reference LLM-pipeline
    operator, tokenizer inference over the documents table)."""
    docs, tok = _token_stream(spark, sf_dir)
    vocab = encode_vocab_arrow(tok.select("w").distinct(), _MERGES_1K)
    return _assemble_per_doc(docs, tok, vocab)


@register(
    "text_bpe_encode_expr8", oracle=_ENC_ORACLE_EXPR8, tags=("text", "tokenizer")
)
def text_bpe_encode_expr8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-form encoder at the 8-rank toy table: per word, chars
    -> one nested greedy left-to-right merge fold per rank, entirely
    whole-stage-codegen'd — zero Python anywhere.  The oracle twin of
    the Arrow kernel: exact and independently checkable at small rank
    count (and pinned bit-equal to the kernel on this table), but each
    rank adds one nesting layer to the Catalyst expression tree, so the
    kernel is the form that scales in rank count."""
    from copperhead_spark.operators.barrier import project_once

    docs, tok = _token_stream(spark, sf_dir)
    vocab = project_once(
        tok.select("w").distinct(),
        "w",
        f"{_encode_word_spark('w')} AS enc",
    ).selectExpr(
        "w",
        "CAST(size(enc) AS BIGINT) AS nt",
        "CAST(size(filter(enc, t -> length(t) > 1)) AS BIGINT) AS nm",
        f"transform(enc, t -> {_tok_hash_spark('t')}) AS hs",
    )
    return _assemble_per_doc(docs, tok, vocab)


def _train_encode_oracle() -> str:
    """Composed oracle: the trainer's own CTE rounds (plans/linkage.py
    _bpe_train_ctes — identical SQL to the text_bpe_train_merges oracle)
    feed the recursive encode as the ``merges`` table, so BOTH halves of
    the E2E replay independently in DuckDB and the hash pins the whole
    train->encode composition."""
    from copperhead_spark.plans.linkage import _BPE_ROUNDS, _bpe_train_ctes

    parts, _ = _bpe_train_ctes()
    tm = " UNION ALL ".join(
        f"SELECT {i} AS rank, l AS ml, r AS mr FROM b{i}"
        for i in range(1, _BPE_ROUNDS + 1)
    )
    merges_ctes = ",\n".join(parts) + f",\nmerges(rank, ml, mr) AS ({tm})"
    return _enc_oracle_from_merges(merges_ctes, _BPE_ROUNDS)


@register(
    "pipeline_tokenizer_train_encode",
    oracle=_train_encode_oracle(),
    tags=("text", "tokenizer", "pipeline"),
)
def pipeline_tokenizer_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer lifecycle E2E in one plan: TRAIN the merge table on the
    corpus (text_bpe_train_merges — per round, the corpus-wide
    adjacent-pair argmax becomes the next merge), then ENCODE the same
    corpus with the trained table via the Arrow kernel.  The trained
    merges cross the driver boundary as a few ranked rows (a merge table
    IS driver-sized by construction — that is the entire premise of
    broadcasting it) and ship back as one broadcast; encoding is the
    vocabulary-factorized kernel path of text_bpe_encode.  The oracle
    replays BOTH halves — trainer rounds AND recursive encode — purely
    in SQL, so a drift anywhere in the composition (tie-breaks in
    training, fold semantics in encoding, reassembly order) hash-fails.
    Reference analogue: none (beyond-reference LLM-pipeline operator —
    the 'train tokenizer, apply tokenizer' loop every corpus pipeline
    runs)."""
    from copperhead_spark.plans.linkage import text_bpe_train_merges

    trained = sorted(
        text_bpe_train_merges(spark, sf_dir).collect(), key=lambda r: r["round"]
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    docs, tok = _token_stream(spark, sf_dir)
    vocab = encode_vocab_arrow(tok.select("w").distinct(), merges)
    return _assemble_per_doc(docs, tok, vocab)

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
