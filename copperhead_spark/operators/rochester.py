"""Rochester-style multi-parameter momentum corrections (SURVEY.md §2.3
J9, §2.10 F4): the reference applies per-muon corrections looked up by
(charge, eta-bin, phi-bin) with a pt-dependent formula, plus a random
smearing term (/root/reference/stage1/corrections/rochester.py:5-64).

Operator shape: the parameter tables ride a broadcast; the correction is
an Arrow-batched pandas UDF doing vectorized numpy bin lookups — the
"too irregular for a SQL join" case (many small tables, data-dependent
table choice).  For THIS table shape a generated CASE expression exists
too, which is exactly what the oracle runs — so the UDF path is
value-checked bit-for-bit (the formula has no transcendentals).

Determinism of the smearing (SURVEY §7 hard part (d)): np.random per
row is irreproducible across retries/partitionings; instead u(event,
idx) is a hash-based uniform — pure integer arithmetic, so the same row
always smears identically on any engine, any partitioning, any retry.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_ETA, N_PHI = 4, 4
ETA_LO, ETA_W = -2.4, 1.2
PHI_LO, PHI_W = -3.141592653589793, 1.5707963267948966

# deterministic parameter tables (analogue of the roccor payload)
_A = np.round(1.0 + 0.002 * np.arange(N_ETA * N_PHI).reshape(N_ETA, N_PHI), 6)
_M = np.round(0.0001 * (1 + np.arange(N_ETA * N_PHI).reshape(N_ETA, N_PHI) % 5), 6)

HASH_P = 2147483647


def hash_uniform_sql(event: str, idx: str) -> str:
    """Deterministic per-row uniform in [0, 1): portable integer hash
    (replaces np.random.rand, rochester.py:8-9)."""
    # reduce mod P before multiplying: keeps every intermediate < 2^62
    # for arbitrary 64-bit keys (found by the hypothesis overflow probe)
    ev = f"(CAST(({event}) AS BIGINT) % {HASH_P})"
    ix = f"(CAST(({idx}) AS BIGINT) % {HASH_P})"
    h = f"(({ev} * 1013904223 + {ix} * 1664525) % {HASH_P} + {HASH_P}) % {HASH_P}"
    return f"CAST({h} AS DOUBLE) / {float(HASH_P)}"


def _bins(eta: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ei = np.clip(np.floor((eta - ETA_LO) / ETA_W).astype(np.int64), 0, N_ETA - 1)
    pi_ = np.clip(np.floor((phi - PHI_LO) / PHI_W).astype(np.int64), 0, N_PHI - 1)
    return ei, pi_


def kscale(charge: np.ndarray, pt: np.ndarray, eta: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """Momentum scale factor 1 / (A + q * M * pt) — vectorized numpy
    over broadcast tables (roccor kScaleDT shape)."""
    ei, pi_ = _bins(eta, phi)
    return 1.0 / (_A[ei, pi_] + charge * _M[ei, pi_] * pt)


def attach_kscale(
    df: DataFrame, pt: str, eta: str, phi: str, charge: str, out: str = "kscale"
) -> DataFrame:
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((_A, _M))

    @F.pandas_udf("double")
    def _kscale(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        A, M = bc.value
        for pdf in it:
            ei, pi_ = _bins(pdf["eta"].to_numpy(), pdf["phi"].to_numpy())
            q = pdf["charge"].to_numpy()
            yield pd.Series(1.0 / (A[ei, pi_] + q * M[ei, pi_] * pdf["pt"].to_numpy()))

    struct = F.struct(
        F.col(pt).alias("pt"),
        F.col(eta).alias("eta"),
        F.col(phi).alias("phi"),
        F.col(charge).alias("charge"),
    )
    return df.withColumn(out, _kscale(struct))


def kscale_case_sql(pt: str, eta: str, phi: str, charge: str) -> str:
    """Generated CASE mirror of the same lookup+formula (the oracle)."""
    ei = f"LEAST(GREATEST(CAST(FLOOR((({eta}) - {ETA_LO}) / {ETA_W}) AS BIGINT), 0), {N_ETA - 1})"
    pi_ = f"LEAST(GREATEST(CAST(FLOOR((({phi}) - {PHI_LO}) / {PHI_W}) AS BIGINT), 0), {N_PHI - 1})"
    cases = []
    for i in range(N_ETA):
        for j in range(N_PHI):
            cases.append(
                f"WHEN ({ei}) = {i} AND ({pi_}) = {j} "
                f"THEN 1.0 / ({_A[i, j]} + ({charge}) * {_M[i, j]} * ({pt}))"
            )
    return "CASE " + " ".join(cases) + " ELSE NULL END"
