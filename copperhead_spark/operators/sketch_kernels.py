"""Vectorized (numpy) kernels for the sketch operators.

The SQL expression forms in plans/sketches.py ARE the semantics (and the
oracle); these kernels compute the same integers batched — the repo's
standard answer to Spark evaluating higher-order-function lambdas
interpreted (~ms/row for per-char folds; see ARCHITECTURE.md "UDF
discipline").  The CMS cell builder below replaces
explode(token-hash HOF) + stack with one mapInPandas pass that emits at
most depth x width partial rows per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame

from copperhead_spark.functions.hashing import MIX_P as P31
from copperhead_spark.functions.hashing import mix_py

TOKEN_P = 1_000_003


def token_hashes_np(texts: "list[str]") -> np.ndarray:
    """Polynomial token hashes ((acc*31 + code) % TOKEN_P per char) for
    every whitespace token of every text, concatenated — bit-identical to
    functions/text.py token_hashes_*.  Vectorized by char-position: one
    masked pass per position within token (max token length passes), all
    tokens advancing in lockstep."""
    joined = " ".join(texts)
    if not joined:
        # a lone empty doc still yields ONE empty token (split('', ' ')
        # returns ['']) whose polynomial hash is 0
        return np.zeros(1, dtype=np.int64)
    codes = (
        np.frombuffer(joined.encode(), dtype=np.uint8).astype(np.int64)
        if joined.isascii()
        else np.array([ord(c) for c in joined], dtype=np.int64)
    )
    is_space = codes == 32
    # token id per char; spaces delimit (empty tokens hash to 0, matching
    # split(text,' ') semantics on doubled spaces)
    tok_id = np.cumsum(is_space)
    n_tok = tok_id[-1] + 1
    pos = np.arange(len(codes)) - np.concatenate(
        ([-1], np.flatnonzero(is_space))
    )[tok_id] - 1
    # chars only (spaces excluded) — pos within token is 0-based
    keep = ~is_space
    codes, tok_id, pos = codes[keep], tok_id[keep], pos[keep]
    h = np.zeros(n_tok, dtype=np.int64)
    max_len = int(pos.max()) + 1 if len(pos) else 0
    for p in range(max_len):
        sel = pos == p
        t = tok_id[sel]
        h[t] = (h[t] * 31 + codes[sel]) % TOKEN_P
    return h


def cms_cells(
    docs: DataFrame, text_col: str, salts: tuple[int, ...], width: int
) -> DataFrame:
    """(salt, bucket, c) CMS cells via a mapInPandas partial-count
    kernel: each Arrow batch collapses to at most len(salts) x width
    rows (np.bincount per salt), merged by one vocabulary-sized groupBy
    SUM — same two-level combine shape as the Gram-matrix operator."""
    import pandas as pd

    from pyspark.sql import functions as F

    salts_arr = np.array(salts, dtype=np.int64)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((len(salts_arr), width), dtype=np.int64)
        touched = False
        for pdf in batches:
            texts = pdf[text_col].tolist()
            if not texts:
                continue
            th = token_hashes_np(texts)
            if len(th) == 0:
                continue
            touched = True
            for i, salt in enumerate(salts_arr):
                b = mix_py(th, int(salt)) % width
                acc[i] += np.bincount(b, minlength=width)
        if touched:
            nz_salt, nz_bucket = np.nonzero(acc)
            yield pd.DataFrame(
                {
                    "salt": salts_arr[nz_salt],
                    "bucket": nz_bucket.astype(np.int64),
                    "c": acc[nz_salt, nz_bucket],
                }
            )

    partials = docs.select(text_col).mapInPandas(
        part, "salt LONG, bucket LONG, c LONG"
    )
    return partials.groupBy("salt", "bucket").agg(F.sum("c").alias("c"))
