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


# ---------------------------------------------------------------------------
# perceptual-hash near-dup over media payloads
# ---------------------------------------------------------------------------

# average-threshold pHash over the fake decoder's 32 "pixels" (ascii of
# the first 32 payload bytes — same contract as mm_decode_features):
# bit i set iff pixel_i > mean.  4 bands x 8 bits; pigeonhole guarantees
# any pair within hamming distance <= 3 shares at least one exact band,
# so the banded equi-join misses nothing at that threshold.
_PH_MAX_HAMMING = 3

_PH_PX_SPARK = "transform(sequence(1, 32), i -> ascii(substring(text, i, 1)))"
_PH_PX_DUCK = "list_transform(range(1, 33), i -> ascii(substring(text, i, 1)))"

_PH_SPARK = (
    "aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) -> acc +"
    " IF(element_at(px, i) * 32 > tot, shiftleft(CAST(1 AS BIGINT), i - 1),"
    " CAST(0 AS BIGINT)))"
)
_PH_DUCK = (
    "list_aggregate(list_transform(range(1, 33), i ->"
    " CASE WHEN px[i] * 32 > tot THEN (CAST(1 AS BIGINT) << (i - 1))"
    " ELSE 0 END), 'sum')"
)

# 8-bit bands via integer division — identical literal arithmetic on
# both engines (no shift-by-column needed)
_PH_BANDS = "[ph % 256, (ph // 256) % 256, (ph // 65536) % 256, (ph // 16777216) % 256]"
_PH_BANDS_SPARK = (
    "array(ph % 256, (ph DIV 256) % 256, (ph DIV 65536) % 256, (ph DIV 16777216) % 256)"
)

_PHASH_ORACLE = f"""
WITH px AS (
  SELECT doc_id, {_PH_PX_DUCK} AS px,
         list_aggregate({_PH_PX_DUCK}, 'sum') AS tot
  FROM documents
),
h AS (SELECT doc_id, {_PH_DUCK} AS ph FROM px),
b AS (
  SELECT doc_id, ph, generate_subscripts(bands, 1) AS band_idx,
         unnest(bands) AS band_val
  FROM (SELECT doc_id, ph, {_PH_BANDS} AS bands FROM h)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, a.ph AS ph1, c.doc_id AS doc2, c.ph AS ph2
  FROM b a JOIN b c
    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
   AND a.doc_id < c.doc_id
)
SELECT doc1, doc2, CAST(bit_count(xor(ph1, ph2)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ph1, ph2)) <= {_PH_MAX_HAMMING}
"""


@register("mm_phash_dedup", oracle=_PHASH_ORACLE, tags=("multimodal", "dedup"))
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over media payloads: the fake
    decoder's 32 pixels -> average-threshold 32-bit pHash -> 4x8-bit
    LSH bands -> banded equi-join -> exact hamming refine (<=
    {_PH_MAX_HAMMING}, where the pigeonhole bound makes banding
    lossless).  The real-image version swaps the pixel expression for a
    DCT over decoded bytes inside the same mapInPandas contract
    (operators/multimodal.decode_media); everything downstream — band
    explode, bucket join, bit_count refine — is media-agnostic.  Scale:
    identical shape to dedup_simhash_pairs — pair volume is bounded by
    band-bucket occupancy, never n^2."""
    from copperhead_spark.operators.barrier import project_once

    docs = table(spark, sf_dir, "documents")
    # project_once barriers: without them ProjectCollapse inlines the
    # 32-term px array into every reference inside the 32-step ph fold
    # (a ~32x expression blowup, paid on BOTH sides of the self-join)
    px = project_once(docs, "doc_id", f"{_PH_PX_SPARK} AS px")
    pt = project_once(px, "doc_id", "px", "aggregate(px, 0, (a, x) -> a + x) AS tot")
    h = project_once(pt, "doc_id", f"{_PH_SPARK} AS ph")
    b = h.selectExpr("doc_id", "ph", f"posexplode({_PH_BANDS_SPARK}) AS (band_idx, band_val)")
    a = b.selectExpr("doc_id AS doc1", "ph AS ph1", "band_idx", "band_val")
    c = b.selectExpr("doc_id AS doc2", "ph AS ph2", "band_idx", "band_val")
    cand = (
        a.join(c, ["band_idx", "band_val"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "ph1", "doc2", "ph2")
        .distinct()
    )
    return cand.selectExpr(
        "doc1", "doc2", f"CAST(bit_count(ph1 ^ ph2) AS BIGINT) AS hamming"
    ).filter(F.col("hamming") <= _PH_MAX_HAMMING)


# ---------------------------------------------------------------------------
# audio-shaped windowed feature extraction
# ---------------------------------------------------------------------------

_AW = 16  # samples per analysis window


@register(
    "mm_audio_energy_windows",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(1, strlen(text) + 1),
                        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS smp,
         strlen(text) // {_AW} AS n_windows
  FROM documents
)
SELECT doc_id,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST(w AS BIGINT) AS window_idx,
       CAST(list_aggregate(list_transform(range(1, {_AW} + 1),
            j -> smp[w * {_AW} + j] * smp[w * {_AW} + j]), 'sum') AS BIGINT) AS energy
FROM s, LATERAL (SELECT unnest(range(0, n_windows)) AS w) t
WHERE n_windows > 0
""",
    tags=("multimodal",),
)
def mm_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction plumbing: frame the payload's samples
    (fake-decoder contract: one sample per byte) into non-overlapping
    {_AW}-sample analysis windows and emit per-window energy (sum of
    squared samples) — the skeleton under spectrogram/VAD passes, with
    the DSP swapped in via the same decode contract as
    mm_decode_features.  All array expressions: the per-doc window list
    materializes map-side and explodes with no shuffle; trailing partial
    windows are dropped (both engines agree by the same floor-div)."""
    docs = table(spark, sf_dir, "documents")
    s = docs.selectExpr(
        "doc_id",
        "transform(sequence(1, octet_length(text)),"
        " i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS smp",
        f"octet_length(text) DIV {_AW} AS n_windows",
    ).filter(F.col("n_windows") > 0)
    return s.selectExpr(
        "doc_id",
        "CAST(n_windows AS BIGINT) AS n_windows",
        f"""posexplode(transform(sequence(0, n_windows - 1), w ->
            aggregate(sequence(1, {_AW}), CAST(0 AS BIGINT),
                      (acc, j) -> acc + element_at(smp, CAST(w * {_AW} + j AS INT))
                                        * element_at(smp, CAST(w * {_AW} + j AS INT)))))
            AS (window_idx, energy)""",
    ).selectExpr(
        "doc_id", "n_windows", "CAST(window_idx AS BIGINT) AS window_idx", "energy"
    )


# ---------------------------------------------------------------------------
# image resize plumbing (nearest-neighbor over the fake pixel grid)
# ---------------------------------------------------------------------------

# source grid 8x4 (32 fake pixels = first 32 payload bytes, row-major),
# target 4x2: nearest-neighbor sample at src[floor(r*4/2)][floor(c*8/4)]
_RS_SW, _RS_SH = 8, 4
_RS_TW, _RS_TH = 4, 2


@register(
    "mm_image_resize",
    oracle=f"""
WITH px AS (
  SELECT doc_id,
         list_transform(range(1, {_RS_SW * _RS_SH} + 1),
                        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS px
  FROM documents
)
SELECT doc_id,
       CAST({_RS_TW} AS BIGINT) AS out_w,
       CAST({_RS_TH} AS BIGINT) AS out_h,
       array_to_string(list_transform(range(0, {_RS_TW * _RS_TH}), o ->
         px[((o // {_RS_TW}) * {_RS_SH // _RS_TH}) * {_RS_SW}
            + ((o % {_RS_TW}) * {_RS_SW // _RS_TW}) + 1]), ',') AS pixels,
       CAST(list_aggregate(list_transform(range(0, {_RS_TW * _RS_TH}), o ->
         px[((o // {_RS_TW}) * {_RS_SH // _RS_TH}) * {_RS_SW}
            + ((o % {_RS_TW}) * {_RS_SW // _RS_TW}) + 1]), 'sum') AS BIGINT)
         AS pixel_sum
FROM px
""",
    tags=("multimodal",),
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: the fake decoder's {_RS_SW}x{_RS_SH}
    row-major pixel grid downsamples nearest-neighbor to
    {_RS_TW}x{_RS_TH} — integer index arithmetic only, so both engines
    pick identical source pixels and the resized grid is value-checked
    cell by cell (plus a checksum).  A real resize swaps the gather
    expression for a Pillow/opencv call inside the same mapInPandas
    decode contract (operators/multimodal.decode_media); schema,
    batching, and row shape — the Spark-side plumbing — are what this
    query pins.  Map-only, zero shuffle.  The resized grid crosses the
    driver gate comma-serialized: raw ARRAY output columns are not
    driver-hashable (CORRECTNESS_r04 lesson, caught here by the
    hardened local gate before the driver saw it)."""
    from copperhead_spark.operators.barrier import project_once

    docs = table(spark, sf_dir, "documents")
    px = project_once(
        docs,
        "doc_id",
        f"transform(sequence(1, {_RS_SW * _RS_SH}),"
        " i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS px",
    )
    gather = (
        f"transform(sequence(0, {_RS_TW * _RS_TH - 1}), o ->"
        f" element_at(px, CAST((o DIV {_RS_TW}) * {_RS_SH // _RS_TH} * {_RS_SW}"
        f" + (o % {_RS_TW}) * {_RS_SW // _RS_TW} + 1 AS INT)))"
    )
    # gather once (Spark skips subexpression elimination on lambda
    # expressions — inlining it twice would evaluate twice per row)
    resized = project_once(
        px,
        "doc_id",
        f"{gather} AS pixels",
    )
    return resized.selectExpr(
        "doc_id",
        f"CAST({_RS_TW} AS BIGINT) AS out_w",
        f"CAST({_RS_TH} AS BIGINT) AS out_h",
        "array_join(CAST(pixels AS ARRAY<STRING>), ',') AS pixels",
        "CAST(aggregate(pixels, CAST(0 AS BIGINT), (a, v) -> a + v) AS BIGINT)"
        " AS pixel_sum",
    )


# ---------------------------------------------------------------------------
# media dedup clusters: phash pairs -> connected components
# ---------------------------------------------------------------------------

_MMCC_ORACLE = f"""
WITH RECURSIVE pairs AS ({_PHASH_ORACLE}),
edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION ALL
  SELECT doc2 AS a, doc1 AS b FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
)
SELECT node AS doc_id, MIN(r) AS component,
       CAST((node = MIN(r)) AS BIGINT) AS keep
FROM reach GROUP BY node
"""


@register("mm_phash_clusters", oracle=_MMCC_ORACLE, tags=("multimodal", "dedup"))
def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup END TO END: perceptual-hash near-dup pairs
    (mm_phash_dedup's banded join) close transitively into duplicate
    clusters via the same O(diameter)-round hash-min propagation the
    text pipeline uses (operators/graph.py) — A~B and B~C must put A and
    C in one cluster even when their hashes differ by more than the
    pairwise threshold, which is why pair output alone cannot drive a
    keep/drop decision.  Each payload is labeled with its cluster's min
    doc_id and keep = (doc_id == component) — the media twin of
    dedup_connected_components, sharing the CC operator verbatim."""
    from copperhead_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents").select("doc_id")
    pairs = mm_phash_dedup(spark, sf_dir).select("doc1", "doc2")
    cc = connected_components(
        docs, pairs, node_col="doc_id", src_col="doc1", dst_col="doc2"
    )
    return cc.withColumn(
        "keep", (F.col("doc_id") == F.col("component")).cast("long")
    )


@register(
    "mm_ppm_real_decode",
    oracle="""
SELECT doc_id,
       CAST(43 AS BIGINT) AS byte_len,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_frames,
       CAST(list_aggregate(list_transform(range(1, 33),
            i -> 32 + ascii(substring(rpad(substring(text, 1, 32), 32, ' '), i, 1)) % 95),
            'sum') AS BIGINT) AS pixel_sum
FROM documents
""",
    tags=("multimodal",),
)
def mm_ppm_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec decode path, driver-checked: each document's first 32
    chars (space-padded) become the raster of a genuine binary P5
    grayscale image (11-byte netpbm header '{header}' + 8x4 samples =
    43 bytes), and the numpy netpbm decoder (operators/multimodal.py
    ppm_decode — a real header-parsing, pixel-summing codec, not the
    byte-arithmetic fake) decodes it through the SAME Arrow mapInPandas
    contract mm_decode_features uses.  The oracle recomputes the header
    constants and the pixel sum from the text independently, so the
    whole encode->decode round trip (header framing, raster layout,
    sample arithmetic) is value-pinned.  This closes the loop the
    seam tests open: the pluggable-decoder contract carries a REAL
    decoder under the driver's correctness gate, not only under local
    tests.

    Each raster sample is clamped to the printable single-byte range
    (32 + codepoint % 95) on BOTH engines, so parity does not depend on
    the corpus being pure ASCII (ADVICE r4 #3: Spark's string->binary
    cast is UTF-8, multi-byte past codepoint 127, which would break the
    byte_len=43 pin for a non-bug on a corpus change).""".format(
        header="P5\\n8 4\\n255\\n"
    )
    from copperhead_spark.operators.multimodal import decode_media, ppm_decode

    docs = table(spark, sf_dir, "documents")
    raster = (
        "concat_ws('', transform(sequence(1, 32), "
        "i -> chr(32 + pmod(ascii(substring("
        "rpad(substring(text, 1, 32), 32, ' '), i, 1)), 95))))"
    )
    payloads = docs.select(
        "doc_id",
        F.concat(F.lit("P5\n8 4\n255\n"), F.expr(raster))
        .cast("binary")
        .alias("payload"),
    )
    return decode_media(payloads, decoder=ppm_decode)


# ---------------------------------------------------------------------------
# REAL WAV/RIFF PCM decode (retires the audio half of the codec gap)
# ---------------------------------------------------------------------------

_WAV_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_transform(range(1, 33),
           i -> CAST(32 + ascii(substring(rpad(substring(text, 1, 32), 32, ' '), i, 1)) % 95 - 79
                AS BIGINT)) AS smp
  FROM documents
)
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(16 AS BIGINT) AS bits,
       CAST(32 AS BIGINT) AS n_samples,
       CAST(w AS BIGINT) AS window_idx,
       CAST(list_aggregate(list_transform(range(1, 17),
            j -> smp[w * 16 + j] * smp[w * 16 + j]), 'sum') AS BIGINT) AS energy
FROM s, LATERAL (SELECT unnest(range(0, 2)) AS w) t
"""


@register("mm_wav_real_decode", oracle=_WAV_ORACLE, tags=("multimodal",))
def mm_wav_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-codec decode path, driver-checked (the audio twin of
    mm_ppm_real_decode): each document's first 32 chars (space-padded,
    clamped to signed samples 32 + codepoint % 95 - 79 in [-47, 47])
    become the PCM track of a genuine RIFF/WAVE container (fmt chunk:
    PCM, mono, 8 kHz, 16-bit signed LE) built by wav_encode, and the
    chunk-walking parser (operators/multimodal.wav_samples — RIFF magic,
    WAVE form, fmt validation, odd-size pad handling, bounded scans)
    decodes it back before the windowed-energy feature (2 windows x 16
    samples, sum of squares) is computed FROM THE DECODED SAMPLES.  The
    oracle recomputes energy from the text independently, so header
    framing, little-endian int16 two's-complement round trip (samples
    are signed — sign handling is load-bearing), and window arithmetic
    are all value-pinned.  The reference's analogue is its torchaudio-
    style media ingestion; here the container format itself is parsed
    with no codec library, mirroring the netpbm precedent.

    Scale: one mapInPandas pass, embarrassingly parallel, no shuffle;
    at 100 TB the same plan holds — per-batch numpy encode/decode keeps
    bytes out of Python row objects."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches):
        from copperhead_spark.operators.multimodal import wav_encode, wav_samples

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                chars = str(text)[:32].ljust(32, " ")
                smp = np.array(
                    [32 + ord(c) % 95 - 79 for c in chars], dtype=np.int64
                )
                dec, rate, nch, bits = wav_samples(
                    wav_encode(smp, sample_rate=8000, bits=16)
                )
                for w in range(len(dec) // 16):
                    win = dec[w * 16 : (w + 1) * 16]
                    rows.append(
                        (doc_id, rate, nch, bits, len(dec), w, int((win * win).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "bits",
                    "n_samples", "window_idx", "energy",
                ],
            )

    return docs.mapInPandas(
        run,
        schema=(
            "doc_id long, sample_rate long, n_channels long, bits long, "
            "n_samples long, window_idx long, energy long"
        ),
    )


# ---------------------------------------------------------------------------
# REAL video frame sampling (retires the frame_sample stub)
# ---------------------------------------------------------------------------

_VFS_ORACLE = """
WITH m AS (
  SELECT doc_id,
         1 + strlen(text) % 4 AS n_frames,
         list_transform(range(1, 33),
           i -> ascii(substring(rpad(substring(text, 1, 32), 32, ' '), i, 1))) AS cp
  FROM documents
),
f AS (
  SELECT doc_id, n_frames, cp, unnest(range(0, n_frames)) AS k FROM m
)
SELECT doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(k AS BIGINT) AS frame_idx,
       CAST(8 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(list_aggregate(list_transform(range(1, 33),
            i -> 32 + (cp[i] + 7 * k) % 95), 'sum') AS BIGINT) AS pixel_sum
FROM f
WHERE k % 2 = 0
"""


@register("mm_video_frame_sample", oracle=_VFS_ORACLE, tags=("multimodal",))
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, driver-checked: each document becomes
    an uncompressed video stream of 1 + strlen % 4 back-to-back binary
    P5 frames (8x4, frame k's raster = chr(32 + (codepoint_i + 7k) % 95)
    — printable ASCII, so the string->binary cast is byte-exact), built
    entirely with SQL expressions; frame_sample (operators/multimodal.py)
    then PARSES the stream frame by frame — each frame's extent comes
    from its own header via _ppm_extent, not from assumed fixed sizes —
    and decodes every 2nd frame to (dims, exact pixel sum).  The oracle
    recomputes sampled-frame sums from the text independently, pinning
    stream splitting, header parsing, raster decode, and the sampling
    stride.  This retires the tree's last NotImplementedError: compressed
    codecs (H.264 etc.) remain out of scope without ffmpeg, but the
    operator contract — payload -> one row per sampled frame keyed
    (doc_id, frame_idx) via mapInPandas — is now a real parser, and a
    pyav swap touches only the frame iterator."""
    from copperhead_spark.operators.multimodal import frame_sample

    docs = table(spark, sf_dir, "documents")
    header = "concat('P5', chr(10), '8 4', chr(10), '255', chr(10))"
    raster = (
        "concat_ws('', transform(sequence(1, 32), i -> "
        "chr(32 + pmod(ascii(substring(rpad(substring(text, 1, 32), 32, ' '), i, 1))"
        " + 7 * k, 95))))"
    )
    payloads = docs.selectExpr(
        "doc_id",
        f"CAST(concat_ws('', transform(sequence(0, octet_length(text) % 4),"
        f" k -> concat({header}, {raster}))) AS BINARY) AS payload",
    )
    return frame_sample(payloads, every_n=2)

from copperhead_spark.docfmt import inline_doc_consts  # noqa: E402  (docstring literal inlining)
inline_doc_consts(globals())
