"""Synthetic F1-shaped event fixture (FIXTURES.md §F1): one row per
event, jagged Muon/Jet/FsrPhoton collections as array-of-struct columns,
with realistic cardinalities and kinematic ranges so region labels and
pair selections are all populated.  Deterministic given (n_events, seed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MUON_FIELDS = T.StructType(
    [
        T.StructField("pt", T.DoubleType()),
        T.StructField("eta", T.DoubleType()),
        T.StructField("phi", T.DoubleType()),
        T.StructField("charge", T.IntegerType()),
        T.StructField("pfRelIso04_all", T.DoubleType()),
        T.StructField("mediumId", T.BooleanType()),
        T.StructField("fsrPhotonIdx", T.IntegerType()),
    ]
)

JET_FIELDS = T.StructType(
    [
        T.StructField("pt", T.DoubleType()),
        T.StructField("eta", T.DoubleType()),
        T.StructField("phi", T.DoubleType()),
        T.StructField("mass", T.DoubleType()),
        T.StructField("jetId", T.IntegerType()),
        T.StructField("qgl", T.DoubleType()),
    ]
)

FSR_FIELDS = T.StructType(
    [
        T.StructField("pt", T.DoubleType()),
        T.StructField("eta", T.DoubleType()),
        T.StructField("phi", T.DoubleType()),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("run", T.LongType()),
        T.StructField("event", T.LongType()),
        T.StructField("genWeight", T.DoubleType()),
        T.StructField("HLT_IsoMu24", T.BooleanType()),
        T.StructField("Flag_goodVertices", T.BooleanType()),
        T.StructField("MET_pt", T.DoubleType()),
        T.StructField("Pileup_nTrueInt", T.DoubleType()),
        T.StructField("Muon", T.ArrayType(MUON_FIELDS)),
        T.StructField("Jet", T.ArrayType(JET_FIELDS)),
        T.StructField("FsrPhoton", T.ArrayType(FSR_FIELDS)),
    ]
)


def generate_events(n_events: int = 2000, seed: int = 42) -> list[tuple]:
    """Rows for EVENT_SCHEMA.  All floats rounded to 4 decimals so any
    re-derivation (pandas oracle in tests) starts from identical doubles."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_events):
        n_mu = int(rng.choice([0, 1, 2, 2, 2, 3, 4], p=[0.1, 0.15, 0.3, 0.2, 0.1, 0.1, 0.05]))
        n_fsr = int(rng.randint(0, 3))
        fsr = [
            (
                round(float(rng.uniform(1, 10)), 4),
                round(float(rng.uniform(-2.4, 2.4)), 4),
                round(float(rng.uniform(-np.pi, np.pi)), 4),
            )
            for _ in range(n_fsr)
        ]
        muons = []
        for _ in range(n_mu):
            muons.append(
                (
                    round(float(rng.uniform(15, 120)), 4),
                    round(float(rng.uniform(-2.6, 2.6)), 4),
                    round(float(rng.uniform(-np.pi, np.pi)), 4),
                    int(rng.choice([-1, 1])),
                    round(float(rng.uniform(0, 0.5)), 4),
                    bool(rng.uniform() < 0.9),
                    int(rng.randint(-1, n_fsr)) if n_fsr else -1,
                )
            )
        n_jet = int(rng.randint(0, 6))
        jets = [
            (
                round(float(rng.uniform(20, 300)), 4),
                round(float(rng.uniform(-4.7, 4.7)), 4),
                round(float(rng.uniform(-np.pi, np.pi)), 4),
                round(float(rng.uniform(5, 40)), 4),
                int(rng.choice([0, 2, 6])),
                round(float(rng.uniform(-1, 1)), 4),
            )
            for _ in range(n_jet)
        ]
        rows.append(
            (
                1,
                i,
                round(float(rng.choice([-1.0, 1.0], p=[0.05, 0.95]) * rng.uniform(0.5, 1.5)), 4),
                bool(rng.uniform() < 0.95),
                bool(rng.uniform() < 0.98),
                round(float(rng.uniform(0, 150)), 4),
                round(float(rng.uniform(10, 60)), 4),
                muons,
                jets,
                fsr,
            )
        )
    return rows


def events_fixture(spark: SparkSession, n_events: int = 2000, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(generate_events(n_events, seed), EVENT_SCHEMA)


# ---------------------------------------------------------------------------
# Distributed fixture: same schema and similar distributions, but generated
# by pure Spark expressions over spark.range(n) — no driver-side Python
# loop, no pickle upload.  This is the generator the benchmark uses: at
# 100 TB the input IS distributed, so the harness that feeds the pipeline
# must be too (the python-loop fixture above stays as the tiny
# pandas-mirror-checkable variant for correctness tests).
# ---------------------------------------------------------------------------


def _u(salt: str) -> str:
    """Deterministic uniform [0,1) keyed by (event id, salt expression)."""
    from copperhead_spark.operators.rochester import hash_uniform_sql

    return hash_uniform_sql("id", salt)


def _jagged(n: str, salt0: int, fields: list[tuple[str, str]]) -> str:
    """array-of-struct built by transform over a sequence; slice() gives a
    correctly-typed empty array when n = 0 (sequence(1,0) would DESCEND)."""
    struct = ", ".join(f"{expr} AS {name}" for name, expr in fields)
    return (
        f"slice(transform(sequence(1, greatest({n}, 1)), "
        f"i -> struct({struct})), 1, {n})"
    )


def events_fixture_distributed(spark: SparkSession, n_events: int) -> DataFrame:
    """EVENT_SCHEMA rows generated executor-side from hash uniforms."""

    def u(salt: int, i: str | None = None) -> str:
        # the underlying hash is affine in its idx key, so (a) adjacent
        # raw salts would yield uniforms offset by a constant -> quadratic
        # salt mixing, and (b) adjacent collection indexes i would yield
        # the SAME offset in every event (e.g. a universal delta-eta
        # between muon 1 and 2) -> the index stride gets an
        # event-dependent component
        mixed = (salt * salt * 131 + salt) % 2147483647
        if i is None:
            return _u(str(mixed))
        return _u(f"{mixed} + CAST({i} AS BIGINT) * (1013904223 + pmod(id, 65521))")

    n_mu = (
        f"CASE WHEN {u(5)} < 0.10 THEN 0 WHEN {u(5)} < 0.25 THEN 1 "
        f"WHEN {u(5)} < 0.85 THEN 2 WHEN {u(5)} < 0.95 THEN 3 ELSE 4 END"
    )
    n_fsr = f"CAST(FLOOR({u(6)} * 3) AS INT)"
    n_jet = f"CAST(FLOOR({u(7)} * 6) AS INT)"
    muon = _jagged(
        "n_mu",
        2000,
        [
            ("pt", f"ROUND(15 + 105 * {u(2001, 'i')}, 4)"),
            ("eta", f"ROUND(-2.6 + 5.2 * {u(2002, 'i')}, 4)"),
            ("phi", f"ROUND(-pi() + 2 * pi() * {u(2003, 'i')}, 4)"),
            ("charge", f"IF({u(2004, 'i')} < 0.5, -1, 1)"),
            ("pfRelIso04_all", f"ROUND(0.5 * {u(2005, 'i')}, 4)"),
            ("mediumId", f"{u(2006, 'i')} < 0.9"),
            (
                "fsrPhotonIdx",
                f"IF(n_fsr > 0, CAST(FLOOR({u(2007, 'i')} * (n_fsr + 1)) AS INT) - 1, -1)",
            ),
        ],
    )
    jet = _jagged(
        "n_jet",
        3000,
        [
            ("pt", f"ROUND(20 + 280 * {u(3001, 'i')}, 4)"),
            ("eta", f"ROUND(-4.7 + 9.4 * {u(3002, 'i')}, 4)"),
            ("phi", f"ROUND(-pi() + 2 * pi() * {u(3003, 'i')}, 4)"),
            ("mass", f"ROUND(5 + 35 * {u(3004, 'i')}, 4)"),
            ("jetId", f"ELEMENT_AT(ARRAY(0, 2, 6), CAST(FLOOR({u(3005, 'i')} * 3) AS INT) + 1)"),
            ("qgl", f"ROUND(-1 + 2 * {u(3006, 'i')}, 4)"),
        ],
    )
    fsr = _jagged(
        "n_fsr",
        4000,
        [
            ("pt", f"ROUND(1 + 9 * {u(4001, 'i')}, 4)"),
            ("eta", f"ROUND(-2.4 + 4.8 * {u(4002, 'i')}, 4)"),
            ("phi", f"ROUND(-pi() + 2 * pi() * {u(4003, 'i')}, 4)"),
        ],
    )
    return (
        spark.range(n_events)
        .selectExpr(
            "id",
            f"{n_mu} AS n_mu",
            f"{n_fsr} AS n_fsr",
            f"{n_jet} AS n_jet",
        )
        .selectExpr(
            "CAST(1 AS BIGINT) AS run",
            "id AS event",
            f"ROUND(IF({u(1)} < 0.05, -1.0, 1.0) * (0.5 + {u(2)}), 4) AS genWeight",
            f"({u(3)} < 0.95) AS HLT_IsoMu24",
            f"({u(4)} < 0.98) AS Flag_goodVertices",
            f"ROUND(150 * {u(8)}, 4) AS MET_pt",
            f"ROUND(10 + 50 * {u(9)}, 4) AS Pileup_nTrueInt",
            f"{muon} AS Muon",
            f"{jet} AS Jet",
            f"{fsr} AS FsrPhoton",
        )
    )
