"""Query registry: the operator inventory as runnable (Spark, oracle) pairs.

Each SURVEY.md §2 ★ operator registers one named query here.  The builder
is the idiomatic-Spark implementation; ``oracle`` is ANSI SQL that DuckDB
runs over the same parquet tables (views pre-registered by the driver).
The driver compares row count + schema + order-insensitive value hash, so
every computed column is aliased identically on both sides and float
aggregates go through functions/exact.py to be bit-deterministic.

Queries with no SQL-expressible oracle (streaming, approximate algorithms
whose hash seeds aren't portable) set ``oracle=None`` → the driver records
a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# plan modules that register queries on import
_PLAN_MODULES = (
    "copperhead_spark.plans.relational",
    "copperhead_spark.plans.relational_ext",
    "copperhead_spark.plans.analytics_ext",
    "copperhead_spark.plans.windows",
    "copperhead_spark.plans.lookups",
    "copperhead_spark.plans.corrections",
    "copperhead_spark.plans.physics",
    "copperhead_spark.plans.arrays",
    "copperhead_spark.plans.timeseries",
    "copperhead_spark.plans.dedup",
    "copperhead_spark.plans.similarity",
    "copperhead_spark.plans.text",
    "copperhead_spark.plans.streaming",
    "copperhead_spark.plans.sources",
    "copperhead_spark.plans.multimodal",
    "copperhead_spark.plans.ml",
    "copperhead_spark.plans.scale_ext",
    "copperhead_spark.plans.training",
    "copperhead_spark.plans.retrieval",
    "copperhead_spark.plans.linalg",
    "copperhead_spark.plans.sketches",
)


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()
    # local-test float tolerance; 0.0 = require bit-exact vs the oracle
    tol: float = 0.0


def register(
    name: str,
    *,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    tol: float = 0.0,
):
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
            tol=tol,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all plan modules (idempotent) and return the registry."""
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # allow partial builds while modules are still being written
            if e.name and e.name.startswith("copperhead_spark"):
                continue
            raise
    return dict(_REGISTRY)
