"""ROOT NanoAOD ingestion (SURVEY.md §2.1 S1/S2): the reference's primary
source is chunked uproot/coffea reads of ROOT TTrees
(/root/reference/run_stage1.py:153-166) with a declarative branch
whitelist (config/branches.py:115-134).

Spark-first design: the steady-state pipeline converts ROOT to parquet
once (this module) and everything downstream is plain parquet scans with
Catalyst pruning.  The direct-read path uses `mapInArrow` over a
DataFrame of (file, entry_start, entry_stop) chunk specs — the exact
analogue of the reference's chunked Runner — with uproot doing the
columnar decode inside each Arrow batch.

uproot/awkward are not installed in this image, so the decode step is
gated: the chunk-planning and Spark plumbing are real and tested; the
byte-level ROOT decode raises ImportError with instructions.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession


def plan_chunks(
    files_with_entries: Sequence[tuple[str, int]], chunk_size: int = 100_000
) -> list[tuple[str, int, int]]:
    """Split (file, n_entries) into entry-range chunks — the coffea
    Runner chunking (run_stage1.py:54-58,157: chunksize=100000)."""
    chunks = []
    for path, n in files_with_entries:
        start = 0
        while start < n:
            chunks.append((path, start, min(start + chunk_size, n)))
            start += chunk_size
    return chunks


def read_nanoaod(
    spark: SparkSession,
    files_with_entries: Sequence[tuple[str, int]],
    branches: Sequence[str],
    tree: str = "Events",
    chunk_size: int = 100_000,
) -> DataFrame:
    """Distributed ROOT scan: one task per entry-range chunk, columnar
    decode to Arrow inside each task, only whitelisted branches read
    (S2 source pruning — uproot deserializes nothing else)."""
    try:
        import uproot  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "ROOT ingestion needs uproot (`pip install uproot awkward`); "
            "in this environment convert NanoAOD to parquet offline and use "
            "catalog.table / spark.read.parquet instead"
        ) from e

    import pyarrow as pa

    chunks = plan_chunks(files_with_entries, chunk_size)
    chunk_df = spark.createDataFrame(chunks, "path string, start long, stop long")

    branch_list = list(branches)

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import uproot

        for batch in batches:
            for row in batch.to_pylist():
                with uproot.open(row["path"]) as f:
                    arrays = f[tree].arrays(
                        branch_list,
                        entry_start=row["start"],
                        entry_stop=row["stop"],
                        library="ak",
                    )
                import awkward as ak

                table = ak.to_arrow_table(arrays)
                yield from table.to_batches()

    # schema must be declared up-front; derive from a zero-entry read
    probe = next(
        decode(
            iter(
                [
                    pa.RecordBatch.from_pylist(
                        [{"path": chunks[0][0], "start": 0, "stop": 0}]
                    )
                ]
            )
        )
    )
    return chunk_df.mapInArrow(decode, schema=pa.schema(probe.schema))
