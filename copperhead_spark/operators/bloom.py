"""Bloom-filter semi-join reduction.

The scale problem: a fact⨝dim join where dim is too large to broadcast
forces a shuffle of the full fact side.  A Bloom filter over the dim
keys is kilobytes regardless of dim size; applying it map-side on the
fact table removes almost all non-matching rows BEFORE the shuffle, so
the exchange moves only (matches + fp_rate x non-matches).  Spark's AQE
has a runtime bloom rewrite for some shapes; this operator is the
explicit, deterministic form — the filter bits are built with the repo's
portable quadratic-mixed hash family, so plans (and the oracle) are
reproducible everywhere.

False positives only ever ADD candidate rows that the exact join then
drops — the final result is bit-identical to the plain join, which is
exactly what the DuckDB oracle checks.

Sizing: k=2 hashes, m bits chosen per expected key count (fp ~
(1-e^(-2n/m))^2; n=2k keys in 2^16 bits -> ~0.4%).  The bitmap is built
with one vocabulary-sized aggregate (bit_or per word) and shipped as a
plan literal — at 100 TB the fact scan never moves, the dim is scanned
once, and the exchange shrinks by ~1/selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from copperhead_spark.functions.hashing import mix_sql as _mix_sql


def build_bloom(dim: DataFrame, key_col: str, log2_bits: int = 16) -> list[int]:
    """Aggregate the dim side into a Bloom bitmap: explode each key into
    its k=2 (word, bit) cells, bit_or per word (vocabulary-sized
    shuffle: at most 2^log2_bits/64 rows), collect the words.  Returns a
    dense list of 2^log2_bits/64 BIGINT words."""
    n_words = (1 << log2_bits) // 64
    cells = dim.selectExpr(
        *[
            f"named_struct('w', CAST(({_mix_sql(key_col, salt)} % {1 << log2_bits})"
            f" div 64 AS INT), 'm', shiftleft(CAST(1 AS BIGINT),"
            f" CAST(({_mix_sql(key_col, salt)} % {1 << log2_bits}) % 64 AS INT)))"
            f" AS c{j}"
            for j, salt in enumerate((23, 29))
        ]
    )
    stacked = cells.selectExpr("stack(2, c0.w, c0.m, c1.w, c1.m) AS (w, m)")
    words = {
        r["w"]: r["bits"]
        for r in stacked.groupBy("w").agg(F.bit_or("m").alias("bits")).collect()
    }
    return [words.get(i, 0) for i in range(n_words)]


def bloom_might_contain(bitmap: list[int], key_col: str, log2_bits: int = 16) -> Column:
    """Membership predicate against a literal bitmap: true for every dim
    key, false for all but ~fp_rate of others.  Pure map-side
    expression — evaluated before any exchange."""
    arr = "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in bitmap) + ")"
    tests = []
    for salt in (23, 29):
        pos = f"({_mix_sql(key_col, salt)} % {1 << log2_bits})"
        word = f"element_at({arr}, CAST({pos} div 64 AS INT) + 1)"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
        tests.append(f"(({word} & {mask}) = {mask})")
    return F.expr(" AND ".join(tests))
