"""Arrow-batched BPE encode kernel: the production-shape encoder for
realistic merge-table sizes.

The SQL-expression encoder (plans/tokenize.py ``_encode_word_spark``)
unrolls ONE nested aggregate() layer PER merge rank — exact and
oracle-checkable, but a few-thousand-rank table (the realistic output of
training, reference analogue: none — beyond-reference LLM-pipeline
operator) would generate a few-thousand-deep Catalyst expression tree
that will not compile.  This kernel applies the SAME algorithm — for
each rank in order, one greedy left-to-right merge pass — as plain
Python over Arrow batches of DISTINCT words, with the ranked merge list
shipped once per executor as a Spark broadcast.  Bit-identical to the
expression form (tests/test_round4_regressions.py pins kernel ≡
expression at the 8-rank table); unlike it, rank count only moves the
per-word loop bound, never the plan depth.

Scale: callers pass the DISTINCT-word projection (vocabulary
factorization — the corpus token stream is massively repetitive, so the
expensive fold runs once per distinct word, then broadcast-joins back
onto the positional stream).  Per word the pass over ranks is a C-level
substring containment check (``l+r in word`` — the concatenation of the
symbol list is always the original word, so a rank whose pair string
never occurs as a substring can never fire and is skipped without a
symbol scan); only candidate ranks pay the O(len) merge fold.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame

_HASH_P = 2_147_483_647  # Mersenne prime; fits products in int64


def apply_merges(word: str, merges: Sequence[tuple[str, str]]) -> list[str]:
    """Sequential rank-order BPE encode of one word: per rank, one greedy
    left-to-right pass merging (left, right) symbol adjacencies — the
    exact fold semantics of the SQL expression twin (a merge fires when
    the accumulator's LAST symbol equals left and the incoming symbol
    equals right, so e.g. ('a','a') over 'aaaa' yields [aa, aa])."""
    syms = list(word)
    for left, right in merges:
        # necessary condition: symbols concatenate to the original word,
        # so an (l, r) adjacency implies l+r is a substring of it
        if left + right not in word:
            continue
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def token_hash(tok: str, p: int = _HASH_P) -> int:
    """Polynomial fold of character codes, base 31, seed 7 — identical
    integer arithmetic to the SQL twins (_tok_hash_spark/_tok_hash_duck)."""
    h = 7
    for c in tok:
        h = (h * 31 + ord(c)) % p
    return h


def encode_vocab_arrow(
    vocab: DataFrame,
    merges: Iterable[tuple[str, str]],
    word_col: str = "w",
) -> DataFrame:
    """Encode a DataFrame of distinct words -> (w, nt, nm, hs).

    nt = token count, nm = merged (multi-char) token count, hs = per-token
    polynomial hashes in sequence order — the exact columns the
    expression-form vocab projection produces, so call sites swap encoder
    without touching plan code.  The merge table rides a real
    SparkContext broadcast (one copy per executor, not per task — at a
    realistic 30k-rank vocab that is ~1 MB, broadcast-sized by
    construction)."""
    import pandas as pd

    bc = vocab.sparkSession.sparkContext.broadcast(tuple(merges))

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ms = bc.value
        for pdf in batches:
            words = pdf[word_col].tolist()
            nt: list[int] = []
            nm: list[int] = []
            hs: list[list[int]] = []
            for w in words:
                syms = apply_merges(w, ms)
                nt.append(len(syms))
                nm.append(sum(1 for t in syms if len(t) > 1))
                hs.append([token_hash(t) for t in syms])
            yield pd.DataFrame({"w": words, "nt": nt, "nm": nm, "hs": hs})

    return vocab.select(word_col).mapInPandas(
        encode_batches, schema="w string, nt bigint, nm bigint, hs array<bigint>"
    )
