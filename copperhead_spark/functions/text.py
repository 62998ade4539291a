"""Text-analysis expression generators (dedup / fingerprinting / quality
— the LLM-training-data-pipeline operator family; no reference
counterpart, mandated beyond-reference capability).

Everything is generated as SQL text in BOTH dialects from one Python
source of truth, using only integer arithmetic (character codes,
polynomial rolling hashes, modular min-hashing) so Spark and the DuckDB
oracle agree bit-for-bit.  No engine-specific hash builtins (xxhash64 /
murmur) — those don't exist portably across engines.

Hash design:
- shingle hash: 5-char shingles, h = sum_k 31^k * ascii(char_{i+k})  (< 2.4e8)
- minhash_k:    min over shingles of (a_k * h + b_k) mod 2147483647
- token hash:   left fold (acc * 31 + code) mod 1000003
- rolling doc fingerprint: left fold (acc * 31 + code) mod 1000000007
"""

from __future__ import annotations

MERSENNE31 = 2_147_483_647
TOKEN_P = 1_000_003
DOC_P = 1_000_000_007

# (a_k, b_k) for the K=8 minhash permutations — fixed, documented constants
MINHASH_COEFFS = [(1_000_003 + 7919 * k, 60_013 + 104_729 * k) for k in range(8)]


def _shingle_core(i: str, col: str = "text") -> str:
    """Polynomial hash of the 5-char shingle starting at 1-based pos ``i``."""
    return " + ".join(
        f"{31**k} * ascii(substring({col}, ({i}) + {k}, 1))" for k in range(5)
    )


def shingle_hashes_spark(col: str = "text") -> str:
    """array<bigint> of shingle hashes (Spark dialect).

    Built from shifted-slice zip_with over a chars->codes array instead
    of per-position substring probes: ascii(substring(s, i, 1)) seeks the
    UTF-8 boundary from the start (O(i)), which makes the naive form
    O(len^2) per row — measured 50x slower at sf0.1.  Everything here is
    array-level (evaluated once per row, never per element), so even when
    ProjectCollapse duplicates the expression per minhash the cost stays
    O(len)."""
    codes = f"transform(split({col}, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    # clamp at 0: slice() throws on negative length for docs shorter than
    # 5 chars (empty shingle set), which a 100TB corpus will contain
    n4 = f"greatest(length({col}) - 4, 0)"
    s = {k: f"slice({codes}, {k + 1}, {n4})" for k in range(5)}
    inner = f"zip_with({s[3]}, {s[4]}, (x3, x4) -> x3 * {31**3} + x4 * {31**4})"
    inner = f"zip_with({s[2]}, {inner}, (x2, r) -> x2 * {31**2} + r)"
    inner = f"zip_with({s[1]}, {inner}, (x1, r) -> x1 * 31 + r)"
    return f"zip_with({s[0]}, {inner}, (x0, r) -> x0 + r)"


def shingle_hashes_duck(col: str = "text") -> str:
    """Same list in DuckDB dialect (range() upper bound is exclusive)."""
    return (
        f"list_transform(range(1, length({col}) - 3),"
        f" i -> CAST({_shingle_core('i', col)} AS BIGINT))"
    )


def minhash_spark(k: int, hashes_expr: str) -> str:
    a, b = MINHASH_COEFFS[k]
    return (
        f"coalesce(array_min(transform({hashes_expr},"
        f" h -> ({a} * h + {b}) % {MERSENNE31})), CAST({MERSENNE31} AS BIGINT))"
    )


def minhash_signature_spark(hashes_expr: str) -> str:
    """All K minhashes in ONE fold over the shingle hashes (array<bigint>
    accumulator).  K separate minhash_spark() columns would re-evaluate
    the shingle pipeline K times after ProjectCollapse inlines them —
    measured 8x slower; callers should also place an exchange (e.g.
    repartition) between this expression and per-column extraction so the
    optimizer cannot re-inline it."""
    init = f"array_repeat(CAST({MERSENNE31} AS BIGINT), {len(MINHASH_COEFFS)})"
    updates = ", ".join(
        f"least(element_at(acc, {k + 1}), ({a} * h + {b}) % {MERSENNE31})"
        for k, (a, b) in enumerate(MINHASH_COEFFS)
    )
    return f"aggregate({hashes_expr}, {init}, (acc, h) -> array({updates}))"


def minhash_duck(k: int, hashes_expr: str) -> str:
    # COALESCE: list_aggregate(.., 'min') is NULL on an empty shingle list;
    # both Spark paths use the MERSENNE31 sentinel there, so pin the oracle
    # to the same value for zero-shingle (short/empty) documents.
    a, b = MINHASH_COEFFS[k]
    return (
        f"COALESCE(list_aggregate(list_transform({hashes_expr},"
        f" h -> ({a} * h + {b}) % {MERSENNE31}), 'min'), {MERSENNE31})"
    )


def token_hashes_spark(col: str = "text") -> str:
    """array<bigint>: polynomial hash of each whitespace token."""
    return (
        f"transform(split({col}, ' '),"
        f" w -> aggregate(sequence(1, length(w)), CAST(0 AS BIGINT),"
        f" (acc, i) -> (acc * 31 + ascii(substring(w, i, 1))) % {TOKEN_P}))"
    )


def token_hashes_duck(col: str = "text") -> str:
    return (
        f"list_transform(string_split({col}, ' '),"
        f" w -> list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, length(w) + 1),"
        f" i -> CAST(ascii(substring(w, i, 1)) AS BIGINT))),"
        f" (acc, c) -> (acc * 31 + c) % {TOKEN_P}))"
    )


def token_ngram_hashes_spark(n: int, token_hashes: str) -> str:
    """array<bigint> of rolling token n-gram hashes: for each window of
    ``n`` consecutive token hashes, sum_k 31^k * tok_{i+k}.  Built as
    shifted-slice zip_with (same O(len) array-level trick as
    shingle_hashes_spark).  Token hashes are < 2^20 and 31^7 < 2^35, so
    every term stays far below 2^62 — no modulus needed."""
    m = f"greatest(size({token_hashes}) - {n - 1}, 0)"
    s = {k: f"slice({token_hashes}, {k + 1}, {m})" for k in range(n)}
    inner = f"zip_with({s[n - 2]}, {s[n - 1]}, (a, b) -> a * {31 ** (n - 2)} + b * {31 ** (n - 1)})"
    for k in range(n - 3, 0, -1):
        inner = f"zip_with({s[k]}, {inner}, (a, r) -> a * {31**k} + r)"
    return f"zip_with({s[0]}, {inner}, (a, r) -> a + r)"


def token_ngram_hashes_duck(n: int, th_col: str) -> str:
    """DuckDB twin: explicit window sum via 1-based list indexing.
    ``th_col`` must be a PLAIN COLUMN reference (materialize the token
    hashes in a CTE first) — it is referenced n times per element, so an
    inline expression would be re-evaluated n*len times."""
    core = " + ".join(f"{31**k} * {th_col}[i + {k}]" for k in range(n))
    return f"list_transform(range(1, length({th_col}) - {n - 2}), i -> {core})"


def rolling_fingerprint_spark(col: str = "text") -> str:
    # fold over a chars->codes array: O(len), vs O(len^2) substring probes
    return (
        f"aggregate(transform(split({col}, ''), ch -> CAST(ascii(ch) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {DOC_P})"
    )


def rolling_fingerprint_duck(col: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, length({col}) + 1),"
        f" i -> CAST(ascii(substring({col}, i, 1)) AS BIGINT))),"
        f" (acc, c) -> (acc * 31 + c) % {DOC_P})"
    )


def simhash_spark(nbits: int, token_hashes: str) -> str:
    """nbits-wide SimHash: per bit, majority vote of (2*bit-1) over token
    hashes; assemble the fingerprint as sum of 2^j for positive votes."""
    parts = []
    for j in range(nbits):
        vote = (
            f"aggregate({token_hashes}, CAST(0 AS BIGINT),"
            f" (acc, h) -> acc + (2 * ((h div {2**j}) % 2) - 1))"
        )
        parts.append(f"CASE WHEN ({vote}) > 0 THEN {2**j} ELSE 0 END")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def simhash_votes_spark(nbits: int, token_hashes: str) -> str:
    """Per-bit votes in ONE fold (array accumulator) — same single-pass
    rationale as minhash_signature_spark."""
    init = f"array_repeat(CAST(0 AS BIGINT), {nbits})"
    updates = ", ".join(
        f"element_at(acc, {j + 1}) + (2 * ((h div {2**j}) % 2) - 1)" for j in range(nbits)
    )
    return f"aggregate({token_hashes}, {init}, (acc, h) -> array({updates}))"


def simhash_from_votes(nbits: int, votes_col: str = "votes") -> str:
    parts = [
        f"CASE WHEN element_at({votes_col}, {j + 1}) > 0 THEN {2**j} ELSE 0 END"
        for j in range(nbits)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def simhash_duck(nbits: int, token_hashes: str) -> str:
    parts = []
    for j in range(nbits):
        vote = (
            f"list_aggregate(list_transform({token_hashes},"
            f" h -> 2 * ((h // {2**j}) % 2) - 1), 'sum')"
        )
        parts.append(f"CASE WHEN ({vote}) > 0 THEN {2**j} ELSE 0 END")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
