"""The repo-wide portable quadratic-mixed hash family, in one place.

A plain affine LCG (``x*A + salt*C mod P``) is a Weyl-like
low-discrepancy sequence on dense integer keys — it produces almost NO
bucket collisions where a random hash would (measured 16.6% HLL error
vs 0.3% after mixing; see plans/sketches.py history).  One modular
squaring breaks the linearity.  ``s < 2^31`` so ``s*s < 2^62`` stays in
BIGINT on Spark, DuckDB, and numpy int64 alike, which is what makes the
sketch cells / bloom bits / candidate buckets bit-identical across the
Spark plan, the DuckDB oracle, and driver-side python twins.

Used by: operators/bloom.py (bloom bits), plans/sketches.py (HLL
buckets/ranks, CMS cells), operators/sketch_kernels.py (vectorized CMS
partials).  Changing A/C/P here changes every sketch and its oracles in
lockstep — which is the point.
"""

from __future__ import annotations

MIX_P = 2_147_483_647  # Mersenne prime 2^31-1, the repo-wide modulus
MIX_A = 1_013_904_223
MIX_C = 1_664_525


def mix_sql(key: str, salt: int) -> str:
    """SQL text of the mixed hash — identical on Spark and DuckDB."""
    s = f"(((({key}) % {MIX_P}) * {MIX_A} + {salt} * {MIX_C}) % {MIX_P})"
    return f"(({s} * {s}) % {MIX_P})"


def mix_py(x, salt: int):
    """Python/numpy twin of :func:`mix_sql` (works elementwise on int64
    arrays — all intermediates stay below 2^62)."""
    s = ((x % MIX_P) * MIX_A + salt * MIX_C) % MIX_P
    return (s * s) % MIX_P
