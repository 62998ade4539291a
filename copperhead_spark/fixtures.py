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
