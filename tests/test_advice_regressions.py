"""Regression tests for round-1 advisor findings (ADVICE.md):

1. shingle/minhash expressions must not throw on documents shorter than
   5 chars, and the Spark paths + DuckDB oracle forms must agree on the
   empty-shingle sentinel (a 100TB corpus contains short/empty docs).
2. bucketed_range_join with how='left' must keep unmatched point rows
   (previously the post-join refine filter silently dropped them).
3. session gap boundary semantics: verified LIVE (below) that Spark's
   session_window MERGES an exactly-30-minute gap into one session on
   this Spark version, so the lag-based batch twin and the DuckDB
   oracles correctly use the strict > predicate.  (The advisor suggested
   >=; the empirical pin below is authoritative.)
"""

import datetime

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from copperhead_spark.functions.text import (
    MERSENNE31,
    minhash_duck,
    minhash_signature_spark,
    minhash_spark,
    shingle_hashes_duck,
    shingle_hashes_spark,
)

SHORT_DOCS = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "hello world"]


def test_short_docs_spark_paths_agree_with_duckdb(spark):
    pdf = pd.DataFrame({"doc_id": range(len(SHORT_DOCS)), "text": SHORT_DOCS})
    df = spark.createDataFrame(pdf)

    # expression path: must not throw, and must yield the sentinel for
    # zero-shingle docs
    got = (
        df.selectExpr(
            "doc_id",
            f"{shingle_hashes_spark()} AS shingles",
            f"{minhash_signature_spark(shingle_hashes_spark())} AS sig",
            f"{minhash_spark(0, shingle_hashes_spark())} AS mh0",
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql(
        f"SELECT doc_id, {shingle_hashes_duck()} AS shingles,"
        f" {minhash_duck(0, shingle_hashes_duck())} AS mh0"
        " FROM docs ORDER BY doc_id"
    ).df()
    con.close()

    for i, text in enumerate(SHORT_DOCS):
        n_shingles = max(len(text) - 4, 0)
        assert list(got.loc[i, "shingles"]) == list(want.loc[i, "shingles"])
        assert len(got.loc[i, "shingles"]) == n_shingles
        assert got.loc[i, "mh0"] == want.loc[i, "mh0"]
        if n_shingles == 0:
            assert got.loc[i, "mh0"] == MERSENNE31
            assert all(v == MERSENNE31 for v in got.loc[i, "sig"])
        # the fold-based signature's first lane equals the k=0 minhash
        assert got.loc[i, "sig"][0] == got.loc[i, "mh0"]


def test_short_docs_arrow_kernel_matches_expressions(spark):
    from copperhead_spark.operators.dedup import minhash_signature_udf

    pdf = pd.DataFrame({"doc_id": range(len(SHORT_DOCS)), "text": SHORT_DOCS})
    df = spark.createDataFrame(pdf)
    kernel = (
        df.select("doc_id", minhash_signature_udf()(F.col("text")).alias("sig"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expr = (
        df.selectExpr(
            "doc_id", f"{minhash_signature_spark(shingle_hashes_spark())} AS sig"
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i in range(len(SHORT_DOCS)):
        assert list(kernel.loc[i, "sig"]) == list(expr.loc[i, "sig"])


def test_range_join_left_keeps_unmatched_points(spark):
    from copperhead_spark.operators.rangejoin import bucketed_range_join

    points = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2, 3, 4], "x": [5.0, 55.0, 205.0, 350.0]})
    )
    # interval [50, 60) matches x=55; [200, 210) matches x=205;
    # x=5 shares bucket 0 with NO interval; x=350 shares bucket 3 with
    # [390, 395) but fails the refine — both must survive a left join.
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {"lo": [50.0, 200.0, 390.0], "hi": [60.0, 210.0, 395.0], "tag": ["a", "b", "c"]}
        )
    )
    inner = bucketed_range_join(
        points, intervals, F.col("x"), bucket_width=100.0, how="inner"
    ).toPandas()
    assert sorted(inner["pid"]) == [2, 3]

    left = (
        bucketed_range_join(points, intervals, F.col("x"), bucket_width=100.0, how="left")
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    assert sorted(left["pid"]) == [1, 2, 3, 4]
    by_pid = left.set_index("pid")
    assert by_pid.loc[2, "tag"] == "a"
    assert by_pid.loc[3, "tag"] == "b"
    assert pd.isna(by_pid.loc[1, "tag"])
    assert pd.isna(by_pid.loc[4, "tag"])  # bucket matched, refine failed


def test_exact_30min_gap_merges_session(spark):
    """Boundary pin: an exactly-30-minute gap MERGES into one session
    under session_window('30 minutes'); a 30min+1s gap splits. The
    lag-based batch predicate (strict >) must agree on both."""
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                base,
                base + datetime.timedelta(minutes=30),  # exactly 30 -> merges
                base + datetime.timedelta(minutes=90, seconds=1),  # 30m1s gap -> splits
                base,
                base + datetime.timedelta(minutes=29, seconds=59),  # same session
            ],
        }
    )
    df = spark.createDataFrame(rows)
    via_window = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .toPandas()
        .set_index("user_id")["n_sessions"]
        .to_dict()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    via_lag = (
        df.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL 30 MINUTE"))
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .toPandas()
        .set_index("user_id")["n_sessions"]
        .to_dict()
    )
    assert via_window == via_lag == {1: 2, 2: 1}


def test_segment_hashes_short_docs_agree_with_duckdb(spark):
    """text_line_dedup segment windows on docs with fewer / exactly /
    just-over 8 tokens: Spark expression and DuckDB twin must both yield
    the same (possibly empty) segment list, and never throw (ANSI
    element_at is guarded by the in-range IF)."""
    from copperhead_spark.functions.text import token_hashes_duck, token_hashes_spark
    from copperhead_spark.plans.text import _seg_hashes_duck, _seg_hashes_spark

    docs = [
        "",  # empty
        "one",  # 1 token
        "a b c d e f g",  # 7 tokens -> no segment
        "a b c d e f g h",  # exactly 8 -> one segment
        "a b c d e f g h i",  # 9 -> one segment, trailing token dropped
        "a b c d e f g h i j k l m n o p",  # 16 -> two segments
    ]
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    df = spark.createDataFrame(pdf)
    got = (
        df.selectExpr(
            "doc_id", f"{token_hashes_spark('text')} AS _th"
        )
        .selectExpr("doc_id", f"{_seg_hashes_spark()} AS segs")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql(
        f"WITH t AS (SELECT doc_id, {token_hashes_duck('text')} AS th FROM docs)"
        f" SELECT doc_id, {_seg_hashes_duck()} AS segs FROM t ORDER BY doc_id"
    ).df()
    con.close()

    exp_counts = [0, 0, 0, 1, 1, 2]
    for i in range(len(docs)):
        g = [int(x) for x in got.loc[i, "segs"]]
        w = [int(x) for x in want.loc[i, "segs"]]
        assert g == w, f"doc {i}: spark {g} != duck {w}"
        assert len(g) == exp_counts[i], f"doc {i}: {len(g)} segments"


# ---------------------------------------------------------------------------
# round-3 advisor findings (ADVICE.md r3)
# ---------------------------------------------------------------------------


def test_map_props_explode_robust_to_dirty_props(spark, tmp_path):
    """ADVICE r3 #2: the parity must not be corpus-coupled.  The oracle
    now discovers the key set itself (json_keys + dynamic extract) and
    the plan uses explode_outer, so NULL / unparseable / empty-bag /
    multi-key props rows agree across engines instead of silently
    breaking the equivalence."""
    from copperhead_spark.plans.registry import all_queries
    from copperhead_spark.testing import make_duckdb, run_query_vs_oracle

    rows = [
        (1, "click", '{"k": 3}'),
        (2, "click", '{"k": 4, "z": 9}'),  # extra key
        (3, "view", "{}"),  # empty bag
        (4, "view", None),  # NULL bag
        (5, "view", "not json"),  # unparseable
        (6, "buy", '{"z": -2}'),  # disjoint key set
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "props": pa.array([r[2] for r in rows]),
            }
        ),
        f"{sf}/events.parquet",
    )
    duck = make_duckdb(sf)
    try:
        rep = run_query_vs_oracle(
            spark, duck, all_queries()["map_props_explode"], sf
        )
        assert rep.ok, str(rep)
        # groups: (click,k), (click,z), (view,NULL — empty/NULL/invalid
        # bags fold into ONE null-keyed group), (buy,z)
        assert rep.rows == 4
    finally:
        duck.close()


def test_scratch_dir_pid_namespaced():
    """ADVICE r3 #3: concurrent sessions on the same scale factor must
    not share sink paths (they used to rmtree/overwrite each other
    mid-query).  scratch_dir is stable within a process, distinct per
    kind, and distinct across processes."""
    import os
    import subprocess
    import sys

    from copperhead_spark.catalog import scratch_dir

    p = scratch_dir("kind_a", "/root/testdata/sf0.01")
    assert f"pid{os.getpid()}" in p
    assert p == scratch_dir("kind_a", "/root/testdata/sf0.01")
    assert p != scratch_dir("kind_b", "/root/testdata/sf0.01")
    assert p != scratch_dir("kind_a", "/root/testdata/sf0.001")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    other = subprocess.run(
        [
            sys.executable,
            "-c",
            "from copperhead_spark.catalog import scratch_dir;"
            "print(scratch_dir('kind_a', '/root/testdata/sf0.01'))",
        ],
        capture_output=True,
        text=True,
        cwd=repo,
    ).stdout.strip()
    assert other and other != p


def test_shared_edges_cache_builds_once_per_session(spark):
    """Round-4 graph edge cache: the build closure runs once per
    (context, sf, kind); repeat calls return the same checkpointed
    relation with identical rows."""
    from copperhead_spark.plans import graph

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).selectExpr("id AS src", "id + 1 AS dst")

    a = graph.shared_edges(spark, "/x/sf_test", "advice_test_kind", build)
    b = graph.shared_edges(spark, "/x/sf_test", "advice_test_kind", build)
    assert calls["n"] == 1
    assert a is b
    assert sorted(r.src for r in b.collect()) == [0, 1, 2, 3, 4]


def test_gbdt_oracle_margin_float64_bitexact():
    """ADVICE r6 #1: the nested-CASE oracle must compute the margin in
    float64, not DECIMAL — DuckDB parses bare 4-decimal literals as
    DECIMAL(5,4) and the exact-decimal sum diverged ~1 ulp from the numpy
    kernel.  _tree_sql now emits CAST(<literal> AS DOUBLE); DuckDB's
    margin must be bit-identical to _margin's float64 sum."""
    import duckdb
    import numpy as np

    from copperhead_spark.ml.gbdt import (
        N_FOLDS,
        _margin,
        fold_trees,
        gbdt_margin_sql,
    )
    from copperhead_spark.ml.inference import FEATURES

    sql = gbdt_margin_sql(fold_key="k")
    assert "AS DOUBLE" in sql and "DECIMAL" not in sql

    rng = np.random.RandomState(7)
    n = 256
    feats = {name: rng.uniform(0.0, 1.0, n) for name, _ in FEATURES}
    keys = rng.randint(0, 10_000, n)
    duck = duckdb.connect()
    try:
        cols = ", ".join(
            f"UNNEST(?::DOUBLE[]) AS {name}" for name, _ in FEATURES
        )
        duck.execute(
            f"CREATE TABLE t AS SELECT UNNEST(?::BIGINT[]) AS k, {cols}",
            [keys.tolist(), *[feats[name].tolist() for name, _ in FEATURES]],
        )
        # the FEATURES exprs reference lineitem columns; here the table
        # already holds the computed features, so strip to bare names
        for name, _ in FEATURES:
            sql = sql.replace(
                f"({dict(FEATURES)[name]})", name
            )
        got = np.array(
            [r[0] for r in duck.execute(f"SELECT ({sql}) FROM t").fetchall()]
        )
    finally:
        duck.close()
    X = np.column_stack([feats[name] for name, _ in FEATURES])
    want = np.empty(n)
    for k in range(N_FOLDS):
        m = (keys % N_FOLDS) == k
        want[m] = _margin(fold_trees(k), X[m])
    assert np.array_equal(got, want)  # bit-identical, no tolerance


def test_wav_encode_rejects_unsupported_bits():
    """r7 ADVICE: wav_encode silently encoded 8-bit data while declaring
    the requested width for bits not in (8, 16) — a self-inconsistent
    container.  It must fail fast, mirroring wav_samples' validation."""
    import pytest

    from copperhead_spark.operators.multimodal import wav_encode, wav_samples

    with pytest.raises(ValueError, match="8/16-bit"):
        wav_encode([0, 1, 2], bits=24)
    # the supported widths still round-trip
    for bits, samples in ((16, [-47, 0, 47]), (8, [0, 128, 255])):
        out, _rate, _nch, got_bits = wav_samples(wav_encode(samples, bits=bits))
        assert got_bits == bits and list(out) == samples


def test_docstring_placeholders_resolved():
    """r7 ADVICE: docstrings embedding {CONST} placeholders rendered the
    braces literally under help().  inline_doc_consts now rewrites every
    resolvable placeholder at import time; this sweeps all plan/operator
    modules and asserts no resolvable placeholder survives."""
    import glob
    import importlib
    import re
    import types

    pat = re.compile(r"\{(_?[A-Z][A-Z0-9_]*)\}")
    unresolved = []
    for path in sorted(
        glob.glob("copperhead_spark/plans/*.py")
        + glob.glob("copperhead_spark/operators/*.py")
    ):
        name = path[:-3].replace("/", ".")
        mod = importlib.import_module(name)
        for obj in vars(mod).values():
            if (
                isinstance(obj, types.FunctionType)
                and obj.__module__ == name
                and obj.__doc__
            ):
                for ph in pat.findall(obj.__doc__):
                    if isinstance(
                        getattr(mod, ph, None), (int, float, str, tuple, list)
                    ):
                        unresolved.append((name, obj.__name__, ph))
    assert unresolved == []


def test_pretrain_e2e_empty_corpus_returns_empty(spark, tmp_path):
    """r7 ADVICE: if every document is filtered before the mixture stage,
    int(max(None)) raised TypeError.  An all-filtered corpus must yield
    an empty result instead."""
    import pandas as pd

    from copperhead_spark.plans.registry import all_queries

    # every doc fails the Gopher gate (too short), so stage 1 empties the
    # corpus and the mixture stage sees max(n) = NULL
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["x", "y z", "w"],
            "lang": ["en", "en", "fr"],
            "source": ["web", "web", "web"],
            "n_chars": [1, 3, 1],
        }
    )
    d = str(tmp_path / "sfempty")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = all_queries()["pipeline_pretrain_corpus_e2e"].builder(spark, d)
    assert out.count() == 0


def test_zl_frames_incompressible_chunk_returns_none():
    """r9 ADVICE: an incompressible chunk can compress LARGER than its
    input (zlib ~5B/32KB stored-block overhead, XZ container overhead);
    near the 0xffffff frame ceiling that used to overflow the 3-byte
    compressed-size field with OverflowError instead of falling back to
    an uncompressed record."""
    import os

    from copperhead_spark.sources.rootio import _MAXZIP, _zl_frames

    rng_bytes = os.urandom(1 << 16)
    # random data never pays: must return None, not raise, for both codecs
    assert _zl_frames(rng_bytes, 6, alg=1) is None
    assert _zl_frames(rng_bytes, 1, alg=2) is None
    # a full-_MAXZIP incompressible chunk is the exact overflow shape
    big = os.urandom(_MAXZIP + 100)
    assert _zl_frames(big, 1, alg=1) is None


def test_zl_frames_incompressible_roundtrips_via_writer(tmp_path):
    """The writer path: an incompressible payload under compress>0 must
    land stored-uncompressed (fNbytes - fKeylen == fObjlen) and read
    back bit-exact."""
    import os

    import numpy as np

    from copperhead_spark.sources.rootio import read_tree, write_tree

    vals = np.frombuffer(os.urandom(8 * 4096), dtype=np.int64).copy()
    p = str(tmp_path / "incompressible.root")
    write_tree(p, "t", {"x": vals}, compress=9)
    got = read_tree(p, "t")["x"]
    assert np.array_equal(got, vals)


def test_bench_cached_gb_sentinel_skips_floor_gate():
    """r9 ADVICE: _cached_gb() returns -1.0 when /proc/meminfo is
    unreadable; the sentinel must be treated as 'unknown' by the page-
    cache floor gate, not folded into the < 3.0 comparison (which would
    refuse every record on such hosts)."""
    # the gate expression in bench.main: 0 <= cached_gb < 3.0
    assert not (0 <= -1.0 < 3.0)
    assert 0 <= 1.5 < 3.0
    assert not (0 <= 4.2 < 3.0)
    import bench

    src = open(bench.__file__).read()
    assert src.count('0 <= cache_probe[k]["cached_gb"] < 3.0') >= 2


def test_scan_entries_empty_batch_schema(spark, tmp_path):
    """r9 ADVICE: an empty Arrow batch inside scan_entries' mapInArrow
    used to build a null-typed path array that mismatched the declared
    schema.  The count fn must skip empty batches and type its arrays."""
    import numpy as np
    import pyarrow as pa

    from copperhead_spark.sources.root_ingest import scan_entries
    from copperhead_spark.sources.rootio import write_tree

    p = str(tmp_path / "one.root")
    write_tree(p, "Events", {"x": np.arange(7, dtype=np.int64)})
    rows = scan_entries(spark, [p]).collect()
    assert [(r["path"], r["entries"]) for r in rows] == [(p, 7)]
    # the decode fn itself must tolerate an empty batch (schema stays
    # declared because nothing is yielded)
    import inspect

    src = inspect.getsource(scan_entries)
    assert "if not rows" in src and "pa.string()" in src
