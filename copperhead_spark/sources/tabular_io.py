"""CSV / JSON / ORC ingestion for lookup tables and interchange.

The reference loads correction tables from CSV/txt files driver-side
(b-tag SF CSV: /root/reference/stage1/corrections/btag_weights.py:4-10;
NNLOPS txt graphs: nnlops.py:6-24; pileup ROOT histograms).  Spark-first
those become small DataFrames read with an EXPLICIT schema (never
inferSchema on the data plane: inference is a second full pass over the
file and types can drift between runs), broadcast into the lookup joins
of operators/lookup.py.

JSON/ORC round-trips are interchange plumbing for the same tables; JSON
additionally covers semi-structured payloads (events.props is queried
via get_json_object in the `json_extract_props` query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql.types import StructType


def read_lookup_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    comment: str = "#",
) -> DataFrame:
    """Read a small correction/lookup table from CSV with an explicit
    schema.  The result is broadcast-sized by contract — callers pass it
    to binned_lookup_join / broadcast joins; nothing here collects it."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("comment", comment)
        .option("mode", "FAILFAST")  # corrupt lookup rows must fail loud
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
