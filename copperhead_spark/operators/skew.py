"""Skew mitigation: salted two-stage aggregation.

HEP events are uniform so the reference never needed this (SURVEY.md §4
"skew handling: none"), but at 100 TB with hot keys (a viral doc_id, a
null-heavy join key) one reducer gets the world.  AQE's skew-join
splitting covers joins; for aggregations with pathological key skew the
classic fix is salting: groupBy((key, salt)) partial -> groupBy(key)
final.  Both stages are hash aggs with map-side partials, so the extra
shuffle carries only n_salts rows per hot key.

Only worthwhile for *algebraic* aggregates (sum/count/min/max — anything
with a merge).  Correctness is independent of the salt: the unit test
checks bit-equality with the unsalted plan for fixed-point sums."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum...) with a salt stage.  ``sums`` maps output
    name -> LONG-typed column expression (fixed-point upstream keeps the
    two-stage re-sum exact; double sums would change association)."""
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(name) for name, c in sums.items()],
        F.count("*").alias("_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sums],
        F.sum("_n").alias("n"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[tuple[str, str]],
    salt_from: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Shuffle join with explicit hot-key salting: the (small) ``dim``
    side is replicated once per salt; the ``fact`` side derives a
    deterministic salt from ``salt_from`` (any well-spread row attribute
    — NOT the join key), so each hot join key fans out over ``n_salts``
    reducers instead of serializing one.  ``on`` is [(fact_col, dim_col)].

    This complements AQE's skew-join splitting (which only splits
    post-shuffle partitions of sort-merge joins): salting also spreads
    the *map-side combine* of a following aggregation, and works for
    shuffled-hash joins.  Replication cost is n_salts * |dim| rows —
    only use when |dim| is small but too hot/too big to broadcast.
    The salt never appears in the output, so correctness is independent
    of n_salts (oracle-pinned by sk2_salted_skew_join)."""
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    fact_s = fact.withColumn("_salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salts)))
    cond = [fact_s[a] == dim_s[b] for a, b in on] + [fact_s["_salt"] == dim_s["_salt"]]
    # shuffle_hash: partition BOTH sides by (key, salt) — the salted
    # hash-partitioning is the skew-spreading mechanism; without the hint
    # Spark would broadcast the replicated dim and skip the shuffle
    return fact_s.join(dim_s.hint("shuffle_hash"), cond).drop("_salt")


# thresholds for choose_skew_strategy (ppm = parts-per-million so the
# rule is integer-exact and loggable next to dq_skew_profile's output)
PLAIN_MAX_RATIO_PPM = 20_000_000  # hot key <= 20x the mean: AQE alone
BROADCAST_MAX_DIM_ROWS = 10_000_000  # dim side small enough to broadcast
TARGET_ROWS_PER_TASK = 2_000_000  # post-split rows a single task should hold
MAX_SALTS = 64


def choose_skew_strategy(
    top_cnt: int,
    n_rows: int,
    n_keys: int,
    dim_rows: int | None = None,
) -> tuple[str, int]:
    """THE decision rule wiring dq_skew_profile (plans/sources.py) to a
    join/agg strategy: feed it the profile's rank-1 row (``top_cnt``,
    ``n_rows``, ``n_keys``) plus the other join side's row count and it
    returns ``(strategy, n_salts)``:

    - ``('plain', 1)`` — hot key <= {PLAIN_MAX_RATIO_PPM/1e6:.0f}x the
      mean key frequency: default hash join/agg; AQE's skew-join split
      absorbs this band at runtime (spark.sql.adaptive.skewJoin).
    - ``('broadcast', 1)`` — heavier skew but the dim side fits a
      broadcast: a map-side join has no shuffle, so key distribution is
      irrelevant; always preferred when available.
    - ``('salt', k)`` — heavy skew AND a non-broadcastable other side:
      salted_join/salted_sum with k = ceil(top_cnt / TARGET_ROWS_PER_TASK)
      clamped to [2, {MAX_SALTS}], so the hottest key's rows spread to
      ~TARGET_ROWS_PER_TASK-row tasks and the dim replication factor
      stays bounded.

    The rule is deliberately a pure integer function of the profile so a
    100 TB pipeline can evaluate it per-stage from metadata alone — see
    bench.py's skew soak, which records the rule's verdict next to the
    measured Zipf timings it was derived from."""
    ratio_ppm = top_cnt * n_keys * 1_000_000 // max(n_rows, 1)
    if ratio_ppm <= PLAIN_MAX_RATIO_PPM:
        return ("plain", 1)
    if dim_rows is not None and dim_rows <= BROADCAST_MAX_DIM_ROWS:
        return ("broadcast", 1)
    n_salts = max(2, min(MAX_SALTS, -(-top_cnt // TARGET_ROWS_PER_TASK)))
    return ("salt", n_salts)

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
