"""Round-9 additions: the composed ROOT->TH1F e2e parity query, the
jagged+compressed S1 scan, and the classifier-curation flagship.

The e2e tests mirror the reference's continuous test
(/root/reference/tests/test_continuous.py:25-101): stages chained in one
run, checked by pinned point-probes (its `dimuon_mass == 117.1209375`
idiom, test_stage1.py:63) plus aggregate yields."""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# pipeline_root_to_th1_e2e: ROOT bytes -> stage1 -> stage2 -> TH1F bytes
# ---------------------------------------------------------------------------


def test_root_scan_is_transparent_to_stage1(spark, sf_dir):
    """The jagged+zlib ROOT roundtrip must be invisible to the pipeline:
    stage1 over the ROOT-scanned events equals stage1 over the in-memory
    fixture row-for-row (float64 payloads are stored big-endian
    bit-exact, ints/bools natively — nothing may shift)."""
    from copperhead_spark.fixtures import events_fixture_distributed
    from copperhead_spark.pipeline import stage1_arrays
    from copperhead_spark.plans.sources import _E2E_ROOT_N, root_events_scan

    via_root = stage1_arrays(root_events_scan(spark, sf_dir))
    direct = stage1_arrays(events_fixture_distributed(spark, _E2E_ROOT_N))
    # nullability differs (mapInArrow outputs are nullable); names and
    # types must match exactly
    assert [(f.name, f.dataType) for f in via_root.schema.fields] == [
        (f.name, f.dataType) for f in direct.schema.fields
    ]
    assert via_root.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_root).count() == 0


def test_root_to_th1_pinned_point_probes(spark, sf_dir):
    """Pinned probes through the full three-stage chain (values frozen
    from the first green run; any byte-level or kinematic drift anywhere
    in encode -> scan -> stage1 -> stage2 -> TH1F moves them)."""
    from copperhead_spark.pipeline import stage1_arrays
    from copperhead_spark.plans.sources import root_events_scan

    s1 = stage1_arrays(root_events_scan(spark, sf_dir))
    first = s1.orderBy("event").select(
        "event", "dimuon_mass", "wgt_nominal", "njets"
    ).first()
    assert first["event"] == 125
    assert first["dimuon_mass"] == 85.63289344734724  # bit-exact pin
    assert first["wgt_nominal"] == 0.893668103664
    assert first["njets"] == 2
    assert s1.count() == 142


def test_root_to_th1_template_yields(spark, sf_dir):
    """Aggregate yields of the read-back TH1F templates (the
    test_continuous 'yields' check): template set, bin count, and the
    float32-quantized totals are pinned."""
    from copperhead_spark.plans.registry import all_queries

    df = all_queries()["pipeline_root_to_th1_e2e"].builder(spark, sf_dir)
    pdf = df.toPandas()
    assert sorted(pdf.template.unique()) == [
        "h-peak__ggh_2orMoreJets",
        "h-peak__vbf",
        "h-sidebands__ggh_2orMoreJets",
        "h-sidebands__vbf",
        "z-peak__vbf",
    ]
    assert len(pdf) == 5 * 39  # 37 bins + under/overflow per template
    assert float(pdf.content.sum()) == 111.48019814491272
    assert float(pdf.sumw2.sum()) == 111.39999367220499
    # a specific populated cell (h-peak bin 28 = mass [130,132))
    cell = pdf[(pdf.template == "h-peak__ggh_2orMoreJets") & (pdf.bin == 28)]
    assert float(cell.content.iloc[0]) == 0.8570399880409241
    assert float(cell.sumw2.iloc[0]) == 0.734517536259


def test_root_events_scan_schema_matches_fixture(spark, sf_dir):
    """The scanned event table exposes the fixture's exact column names
    and element types (the NanoEvents contract stage1 consumes)."""
    from copperhead_spark.fixtures import EVENT_SCHEMA
    from copperhead_spark.plans.sources import root_events_scan

    got = root_events_scan(spark, sf_dir).schema
    want = {f.name: f.dataType.simpleString() for f in EVENT_SCHEMA.fields}
    have = {f.name: f.dataType.simpleString() for f in got.fields}
    assert have == want


# ---------------------------------------------------------------------------
# s1_root_scan_jagged: counts/value alignment across chunk boundaries
# ---------------------------------------------------------------------------


def test_jagged_chunk_boundaries_slice_value_stream(spark, sf_dir):
    """Exploding the jagged scan must reproduce the original lineitem
    rows exactly — per-order value alignment across chunk AND basket
    boundaries (chunk 900 vs basket 512 never align)."""
    from pyspark.sql import functions as F

    from copperhead_spark.catalog import table
    from copperhead_spark.plans.sources import _root_jagged_fixture
    from copperhead_spark.sources.root_ingest import read_nanoaod, rootio_decoder

    path, n = _root_jagged_fixture(spark, sf_dir)
    df = read_nanoaod(
        spark, [(path, n)],
        ("o_orderkey", "li_linenumber", "li_extendedprice"),
        tree="Events", chunk_size=900, decoder=rootio_decoder,
    )
    exploded = df.select(
        "o_orderkey",
        F.explode(F.arrays_zip(
            F.col("li_linenumber").alias("ln"),
            F.col("li_extendedprice").alias("px"),
        )).alias("li"),
    ).select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("li.ln").cast("int").alias("l_linenumber"),
        F.col("li.px").alias("l_extendedprice"),
    )
    orig = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    assert exploded.exceptAll(orig).count() == 0
    assert orig.exceptAll(exploded).count() == 0


# ---------------------------------------------------------------------------
# rootio unit coverage the property suite doesn't reach
# ---------------------------------------------------------------------------


def test_rootio_pruned_compressed_baskets_not_inflated(tmp_path, monkeypatch):
    """Basket-level pruning must hold through compression: reading a
    1-basket window of a compressed jagged tree inflates only the
    baskets overlapping the window (counts + payload branches), proven
    by counting zlib.decompress calls."""
    import zlib as _zlib

    from copperhead_spark.sources import rootio

    n = 1000
    rng = np.random.RandomState(3)
    counts = rng.randint(0, 4, n).astype(np.int32)
    vals = rng.uniform(size=int(counts.sum()))
    path = str(tmp_path / "p.root")
    rootio.write_tree(
        path, "T",
        {"nX": counts, "flat": rng.uniform(size=n)},
        {"X": ("nX", vals)},
        basket_entries=100, compress=6,
    )
    calls = []
    real = _zlib.decompress

    def spy(data, *a, **k):
        calls.append(len(data))
        return real(data, *a, **k)

    monkeypatch.setattr(rootio.zlib, "decompress", spy)
    got = rootio.read_tree(path, "T", ["X"], 150, 240)
    c, v = got["X"]
    assert np.array_equal(c, counts[150:240])
    off = int(counts[:150].sum())
    assert np.array_equal(v, vals[off : off + int(counts[150:240].sum())])
    # window [150,240) overlaps baskets 1 and 2 of 10 -> at most 2
    # payload inflations for X + 2 for its counts branch (flat never read)
    assert len(calls) <= 4


def test_rootio_v1_files_remain_readable(tmp_path):
    """Files written by the r8 (v1 index) writer still read: synthesize
    a v1 CSTreeIndex + header-described baskets byte-for-byte."""
    import struct

    from copperhead_spark.sources import rootio

    a = np.arange(10, dtype=np.float64)
    w = rootio._Writer(str(tmp_path / "v1.root"))
    idx = struct.pack(">hqi", 1, 10, 1) + rootio._tstring("a") + b"D"
    w.add(rootio._TREE_INDEX_CLASS, "T", "", idx)
    for lo in range(0, 10, 4):
        chunk = a[lo : lo + 4]
        w.add("TBasket", "a", "T", rootio._basket_bytes(chunk, "D", len(chunk)))
    w.close()
    back = rootio.read_flat_tree(str(tmp_path / "v1.root"), "T", ["a"], 2, 9)
    assert np.array_equal(back["a"], a[2:9])


def test_rootio_missing_index_error_is_actionable(tmp_path):
    """ROOT-parseable file without a CSTreeIndex -> KeyError that names
    the remediation (the r8 ADVICE error-message item)."""
    from copperhead_spark.sources import rootio

    path = str(tmp_path / "h.root")
    rootio.write_th1f(
        path, [dict(name="h", nbins=2, xlo=0, xhi=1, contents=np.zeros(4))]
    )
    with pytest.raises(KeyError, match="uproot"):
        rootio.read_tree(path, "Events")
