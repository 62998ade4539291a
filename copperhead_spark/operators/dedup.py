"""Vectorized dedup kernels (Arrow pandas UDFs).

The pure-expression forms (functions/text.py) are the portable reference
implementation — every value they produce is reproducible in ANSI SQL.
But Spark evaluates higher-order-function lambdas interpreted (no
whole-stage codegen), which makes a 550-shingle × 8-permutation fold
~1.4 ms/doc.  The kernels here compute the *identical integers* with
numpy (int64 throughout, same modular arithmetic), ~100x faster, and the
DuckDB oracle built from the expression form validates them value-for-
value — UDF-vs-SQL cross-checking, not UDF-trust.

ASCII fast path uses frombuffer; non-ASCII falls back to per-codepoint
ord() (Spark's ascii() semantics = first code point)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from copperhead_spark.functions.text import DOC_P, MERSENNE31, MINHASH_COEFFS, TOKEN_P

_A = np.array([a for a, _ in MINHASH_COEFFS], dtype=np.int64)
_B = np.array([b for _, b in MINHASH_COEFFS], dtype=np.int64)
_POW31 = np.array([31**k for k in range(5)], dtype=np.int64)


def _codes(text: str) -> np.ndarray:
    if text.isascii():
        return np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    return np.array([ord(c) for c in text], dtype=np.int64)


def _shingle_hashes(codes: np.ndarray) -> np.ndarray:
    n = len(codes) - 4
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    for k in range(5):
        h += _POW31[k] * codes[k : k + n]
    return h


def minhash_signature(text: str) -> list[int]:
    h = _shingle_hashes(_codes(text))
    if len(h) == 0:
        return [MERSENNE31] * len(_A)
    return ((_A[:, None] * h[None, :] + _B[:, None]) % MERSENNE31).min(axis=1).tolist()


def minhash_signature_udf():
    """Arrow UDF factory (pandas_udf needs an active session, so the
    decorator can't run at import time)."""

    @F.pandas_udf("array<long>")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(minhash_signature)

    return _udf


def simhash16(text: str) -> int:
    votes = np.zeros(16, dtype=np.int64)
    for w in text.split(" "):
        h = np.int64(0)
        for c in _codes(w):
            h = (h * 31 + c) % TOKEN_P
        bits = (h >> np.arange(16)) & 1
        votes += 2 * bits - 1
    return int(((votes > 0) << np.arange(16)).sum())


def simhash16_udf():
    @F.pandas_udf("long")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(simhash16)

    return _udf


def rolling_fingerprint(text: str) -> int:
    acc = 0
    for c in _codes(text):
        acc = (acc * 31 + int(c)) % DOC_P
    return acc
