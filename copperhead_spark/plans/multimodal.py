"""Multimodal queries: binary payload columns + mapInPandas decode
(operators/multimodal.py).  The deterministic fake decoder makes the full
Spark plumbing (binary encode -> Arrow batches -> mapInPandas -> typed
features) oracle-checkable byte-for-byte."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from copperhead_spark.catalog import table
from copperhead_spark.operators.multimodal import decode_media
from copperhead_spark.plans.registry import register


@register(
    "mm_media_metadata",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       md5(text) AS checksum,
       'text/plain' AS mime
FROM documents
""",
    tags=("multimodal",),
)
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata: byte length + checksum + mime tag — the
    catalog row every media lake keeps beside the binary column."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("byte_len"),
        F.md5(F.col("text").cast("binary")).alias("checksum"),
        F.lit("text/plain").alias("mime"),
    )


@register(
    "mm_decode_features",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       CAST(64 + strlen(text) % 512 AS BIGINT) AS width,
       CAST(64 + (strlen(text) * 7) % 512 AS BIGINT) AS height,
       CAST(1 + strlen(text) % 4 AS BIGINT) AS n_frames,
       CAST(list_aggregate(list_transform(range(1, 33),
            i -> ascii(substring(text, i, 1))), 'sum') AS BIGINT) AS pixel_sum
FROM documents
""",
    tags=("multimodal",),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode via mapInPandas (deterministic fake decoder): text
    encoded to a binary payload column, streamed through Arrow batches,
    decoded to typed features.  The oracle mirrors the byte arithmetic —
    the UDF plumbing itself is what's being value-checked."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return decode_media(docs)


@register(
    "mm_frame_sample",
    oracle="""
WITH m AS (
  SELECT doc_id,
         1 + strlen(text) % 4 AS n_frames,
         40 * strlen(text) AS duration_ms
  FROM documents
), f AS (
  SELECT doc_id, n_frames, duration_ms,
         unnest(range(0, n_frames)) AS frame_idx
  FROM m
)
SELECT doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST((frame_idx * duration_ms) // n_frames AS BIGINT) AS frame_ts_ms
FROM f
""",
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: per media row, expand to one row
    per sampled frame with its integer timestamp — the UDTF-shaped
    explode every multimodal pipeline needs before per-frame decode
    (decode itself stays in operators/multimodal.decode_media).  The
    expansion is a Generate (explode of sequence) — map-side only, no
    shuffle; at 100 TB the row multiplier is bounded by n_frames, so
    input splits stay balanced without a repartition.  Frame metadata
    here derives deterministically from the payload length (the same
    fake-decoder contract as mm_decode_features)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id",
            "CAST(1 + octet_length(text) % 4 AS BIGINT) AS n_frames",
            "CAST(40 * octet_length(text) AS BIGINT) AS duration_ms",
        )
        .selectExpr(
            "doc_id",
            "n_frames",
            "duration_ms",
            "explode(sequence(CAST(0 AS BIGINT), n_frames - 1)) AS frame_idx",
        )
        .selectExpr(
            "doc_id",
            "n_frames",
            "frame_idx",
            "CAST((frame_idx * duration_ms) DIV n_frames AS BIGINT) AS frame_ts_ms",
        )
    )
