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


# Per-call char budget for token_hashes_np: the whole-batch algorithm
# allocates ~15 temporaries of len(chars) each, and two measured effects
# make UNbounded batches pathological (r12, the "slow CMS kernel in the
# bench sweep" mystery): numpy 1.26's add.accumulate on a bool input
# drops to a buffered casting loop above ~1M elements (3.2 s vs 0.01 s
# at 1.5M chars), and on hosts with virtio free-page reporting every
# fresh multi-MB allocation pays host-side refaults (a 5000-doc batch
# measured 6-9 s vs 0.11 s for the same docs in 1000-doc slices).
# Bounded slices keep every temporary cache/TLB-warm and allocator-
# recycled.  Output is exactly the concatenation of per-slice outputs:
# " ".join inserts one space between docs, so no token ever spans a doc
# boundary and slicing at doc boundaries preserves every token.
_HASH_CHUNK_CHARS = 1 << 18


def token_hashes_np(texts: "list[str]") -> np.ndarray:
    """Polynomial token hashes ((acc*31 + code) % TOKEN_P per char) for
    every whitespace token of every text, concatenated — bit-identical to
    functions/text.py token_hashes_*.  Vectorized by char-position: one
    masked pass per position within token (max token length passes), all
    tokens advancing in lockstep; docs are processed in bounded char
    slices (see _HASH_CHUNK_CHARS above)."""
    if not texts:
        # a lone empty doc still yields ONE empty token (split('', ' ')
        # returns ['']) whose polynomial hash is 0
        return np.zeros(1, dtype=np.int64)
    out = []
    start = 0
    while start < len(texts):
        stop, budget = start, _HASH_CHUNK_CHARS
        while stop < len(texts) and budget >= 0:
            budget -= len(texts[stop]) + 1
            stop += 1
        out.append(_hash_doc_slice(texts[start:stop]))
        start = stop
    return out[0] if len(out) == 1 else np.concatenate(out)


def _hash_doc_slice(texts: "list[str]") -> np.ndarray:
    joined = " ".join(texts)
    if not joined:
        # empty docs still yield one empty token each (split('', ' ')
        # returns ['']); with k docs joined there are k-1 spaces and k
        # empty tokens, all hashing to 0 — handled by the main path for
        # k > 1 and by this early return for k == 1
        return np.zeros(1, dtype=np.int64)
    codes = (
        np.frombuffer(joined.encode(), dtype=np.uint8).astype(np.int64)
        if joined.isascii()
        else np.array([ord(c) for c in joined], dtype=np.int64)
    )
    is_space = codes == 32
    # token id per char; spaces delimit (empty tokens hash to 0, matching
    # split(text,' ') semantics on doubled spaces); int8 view for the
    # cumsum (numpy bool-input slow path, header note)
    tok_id = np.cumsum(is_space.view(np.int8), dtype=np.int64)
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
