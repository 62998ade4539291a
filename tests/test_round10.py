"""Round-10 additions: pure-python LZ4 (kLZ4 "L4" basket frames),
variation-axis TH1 templates, stage-3 fit on the e2e chain."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# LZ4 block codec + xxHash64 (sources/lz4codec.py)
# ---------------------------------------------------------------------------


def test_xxh64_known_vectors():
    """Published xxHash64 vectors (seed 0): the empty string and 'abc'
    (the values every implementation's sanity suite pins)."""
    from copperhead_spark.sources.lz4codec import xxh64

    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # seed participates (spec: accumulators and short-input base differ)
    assert xxh64(b"abc", seed=1) != xxh64(b"abc")


def test_xxh64_matches_spark_builtin(spark):
    """Cross-engine pin: Spark's xxhash64 (seed 42, same published
    algorithm, independent JVM implementation) agrees on every length
    class — empty, <4, <8, <32, and stripes+tail."""
    from copperhead_spark.sources.lz4codec import xxh64

    tests = [
        b"",
        b"a",
        b"abc",
        b"hello w",
        b"0123456789abcdef",
        bytes(range(256)) * 3 + b"tail",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tests)], "i int, b binary"
    )
    got = {r["i"]: r["h"] for r in df.selectExpr("i", "xxhash64(b) AS h").collect()}
    for i, t in enumerate(tests):
        assert xxh64(t, seed=42) == got[i] & ((1 << 64) - 1), i


@given(st.binary(min_size=0, max_size=4000), st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_lz4_block_roundtrip_property(data, stretch):
    """compress -> decompress is the identity for arbitrary bytes, and
    for repetitive variants (where matches, incl. overlapping ones with
    offset < length, actually fire)."""
    from copperhead_spark.sources.lz4codec import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    if stretch and data:
        data = (data * (stretch + 1))[: len(data) * 2 + 7]
    c = lz4_block_compress(data)
    assert lz4_block_decompress(c, len(data)) == data


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=100, deadline=None)
def test_lz4_decoder_never_crashes_on_garbage(payload):
    """Arbitrary bytes either decode (to the declared size) or raise
    ValueError — never IndexError/struct.error/infinite loop (the
    rootio parser hardening contract)."""
    from copperhead_spark.sources.lz4codec import lz4_block_decompress

    for usize in (0, 1, len(payload), 4 * len(payload) + 17):
        try:
            out = lz4_block_decompress(payload, usize)
            assert len(out) == usize
        except ValueError:
            pass


def test_lz4_handbuilt_block_decodes():
    """A hand-assembled spec example: 5 literals, then an overlapping
    match (offset 5, length 8: 'hello' repeats periodically), then the
    closing literal run."""
    from copperhead_spark.sources.lz4codec import lz4_block_decompress

    blk = bytes([0x54]) + b"hello" + bytes([5, 0]) + bytes([0x50]) + b"world"
    assert lz4_block_decompress(blk, 18) == b"hellohellohelworld"


def test_lz4_decoder_rejects_bad_offsets():
    from copperhead_spark.sources.lz4codec import lz4_block_decompress

    # offset 0 is invalid per spec
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([0x10]) + b"x" + bytes([0, 0]) + bytes([0x00]), 99)
    # offset beyond the decoded window
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([0x10]) + b"x" + bytes([9, 0]) + bytes([0x00]), 99)


def test_lz4_compress_spec_constraints():
    """Encoder output obeys the block-format end rules: the stream ends
    with a literal run covering at least the last 5 bytes, and every
    emitted match is >= 4 bytes with offset <= 65535 (checked by a
    strict re-parse that asserts instead of tolerating)."""
    from copperhead_spark.sources.lz4codec import lz4_block_compress

    data = (b"spark" * 400) + bytes(range(256)) + (b"spark" * 3)
    c = lz4_block_compress(data)
    pos, n = 0, len(c)
    decoded = bytearray()
    last_match_end = -1
    while pos < n:
        token = c[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                lit += c[pos]
                pos += 1
                if c[pos - 1] != 255:
                    break
        decoded += c[pos : pos + lit]
        pos += lit
        if pos == n:
            break
        off = c[pos] | (c[pos + 1] << 8)
        pos += 2
        assert 1 <= off <= 0xFFFF and off <= len(decoded)
        ml = token & 15
        if ml == 15:
            while True:
                ml += c[pos]
                pos += 1
                if c[pos - 1] != 255:
                    break
        ml += 4
        start = len(decoded) - off
        for i in range(ml):
            decoded.append(decoded[start + i])
        last_match_end = len(decoded)
    assert bytes(decoded) == data
    # last match ends at least 5 bytes before the block end
    assert last_match_end <= len(data) - 5


def test_root_jagged_scan_over_l4_fixture(spark, tmp_path):
    """The s1_root_scan_jagged plan shape end-to-end over a kLZ4
    (compress=406) jagged tree: the chunked mapInArrow scan + array-HOF
    aggregation returns byte-identical results to the same tree stored
    uncompressed — closing the r9 VERDICT item (LZ4 is the modern
    NanoAOD default; it used to raise)."""
    import numpy as np

    from copperhead_spark.sources.root_ingest import read_nanoaod, rootio_decoder
    from copperhead_spark.sources.rootio import write_tree

    rng = np.random.RandomState(42)
    n = 700
    counts = rng.randint(0, 7, n).astype(np.int32)
    nv = int(counts.sum())
    cols = {
        "evt": np.arange(n, dtype=np.int64),
        "n_x": counts,
    }
    jag = {"x_val": ("n_x", rng.uniform(-50, 50, nv))}
    paths = {}
    for label, spec in (("plain", 0), ("lz4", 406)):
        p = str(tmp_path / f"{label}.root")
        write_tree(
            p, "Events", dict(cols), dict(jag),
            basket_entries=128, compress=spec,
        )
        paths[label] = p
    outs = {}
    for label, p in paths.items():
        df = read_nanoaod(
            spark, [(p, n)], ("evt", "n_x", "x_val"),
            tree="Events", chunk_size=200, decoder=rootio_decoder,
        )
        outs[label] = sorted(
            df.selectExpr(
                "evt",
                "CAST(n_x AS BIGINT) AS n_x",
                "aggregate(x_val, 0L,"
                " (a, v) -> a + CAST(ROUND(v * 1000) AS BIGINT)) AS xc",
            ).collect()
        )
    assert outs["lz4"] == outs["plain"]
    assert len(outs["lz4"]) == n
    # the lz4 file really stores L4 frames
    raw = open(paths["lz4"], "rb").read()
    assert b"L4\x01" in raw and b"ZL\x08" not in raw


# ---------------------------------------------------------------------------
# variation-axis TH1 sink + stage-3 fit on the e2e chain
# ---------------------------------------------------------------------------


def test_variations_e2e_nominal_slice_matches_nominal_e2e(spark):
    """The variation-suffixed template set must contain the nominal e2e's
    templates EXACTLY (same names, same contents bit-for-bit): threading
    the variation axis through the sink cannot move the nominal path."""
    from copperhead_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    nom = {
        (r["template"], r["bin"]): (r["content"], r["sumw2"])
        for r in qs["pipeline_root_to_th1_e2e"].builder(spark, sf).collect()
    }
    var = {
        (r["template"], r["bin"]): (r["content"], r["sumw2"])
        for r in qs["pipeline_root_to_th1_variations_e2e"].builder(spark, sf).collect()
    }
    # nominal names carry no suffix -> they are a strict subset
    assert set(nom) <= set(var)
    for k, v in nom.items():
        assert var[k] == v, k
    # each nominal template has exactly its Up and Down siblings
    names = {t for t, _ in var}
    for t, _ in nom:
        assert f"{t}_muidUp" in names and f"{t}_muidDown" in names
    assert len(names) == 3 * len({t for t, _ in nom})


def test_variations_e2e_updown_bracket_nominal(spark):
    """muid_up scales every event weight by 1.01^2 and muid_down by
    0.99^2, so each populated bin must satisfy down < nominal < up (the
    coherent-shift semantics of weights.py:37-47)."""
    from copperhead_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.001"
    q = all_queries()["pipeline_root_to_th1_variations_e2e"]
    rows = q.builder(spark, sf).collect()
    by = {(r["template"], r["bin"]): r["content"] for r in rows}
    checked = 0
    for (t, b), v in by.items():
        if t.endswith("_muidUp") or t.endswith("_muidDown") or v <= 0:
            continue
        up, down = by[(f"{t}_muidUp", b)], by[(f"{t}_muidDown", b)]
        assert down < v < up, (t, b)
        checked += 1
    assert checked > 30  # 45 populated positive nominal bins at sf-fixture


def test_fit_e2e_pinned_point_probes(spark):
    """Reference-style pinned probes (test_continuous.py:80-101 pins
    dimuon_mass/yield values the same way) on the stage-3 fit chained
    onto the e2e chain: the fixture and fitter are deterministic, so the
    chi2/ndf per category is a constant of the codebase.  The winning
    FAMILY is pinned exactly only where the chi2 gap to the runner-up is
    real: chebyshev3 and bernstein3 span the same cubic space, so on
    smooth categories their fitted chi2 agree to ~1e-16 and the argmin
    between them is BLAS low-bit noise (r12: the pin flipped across a
    host reboot with the histogram bit-identical — measured gaps 0 to
    1.1e-16 on three of these categories).  Either cubic family passing
    is the fitter working correctly; a real regression (family blowing
    up, selection picking a non-polynomial, chi2 drift) still fails."""
    import pytest as _pytest

    from copperhead_spark.finishing.fits import fit_histogram_table
    from copperhead_spark.pipeline import stage1_arrays, stage2
    from copperhead_spark.plans.sources import root_events_scan

    CUBICS = {"chebyshev3", "bernstein3"}
    hist = stage2(stage1_arrays(root_events_scan(spark, "/root/testdata/sf0.001")))
    fits = fit_histogram_table(hist.toPandas(), 76.0, 150.0, 37)
    pins = {
        ("h-peak", "vbf"): (CUBICS, 0.4263),
        ("h-sidebands", "ggh_2orMoreJets"): (CUBICS, 0.4024),
        ("h-sidebands", "vbf"): ({"bwGamma"}, 0.5787),  # gap to 2nd: 0.135
        ("z-peak", "vbf"): (CUBICS, 0.1918),
    }
    assert set(fits) == set(pins)
    for key, (models, chi2_ndf) in pins.items():
        r = fits[key]
        assert r.model in models, key
        assert r.chi2_ndf == _pytest.approx(chi2_ndf, rel=5e-3), key
    # one parameter-level probe, bit-stable on the deterministic fixture
    assert fits[("h-sidebands", "vbf")].params[1] == _pytest.approx(
        0.053724, rel=1e-4
    )


# ---------------------------------------------------------------------------
# write-side TStreamerInfo records (sources/streamerinfo.py)
# ---------------------------------------------------------------------------


def test_streamer_list_roundtrip_structure():
    """The StreamerInfo TList blob parses back (via the spec-written
    parser) to the exact class/version/element structure that was
    emitted — TTree/TBranch/TLeaf + the five leaf specializations, with
    the jagged //[fMaxBaskets] members as TStreamerBasicPointer."""
    from copperhead_spark.sources.streamerinfo import (
        minimal_tree_streamers,
        read_streamer_list,
        streamer_list,
    )

    infos = read_streamer_list(streamer_list(minimal_tree_streamers()))
    assert [i["cls"] for i in infos] == [
        "TTree", "TBranch", "TLeaf",
        "TLeafF", "TLeafD", "TLeafI", "TLeafL", "TLeafO",
    ]
    tree = infos[0]
    assert tree["version"] == 20
    assert [e["name"] for e in tree["elements"]][:2] == ["fEntries", "fTotBytes"]
    branch = infos[1]
    ptrs = [e for e in branch["elements"] if e["element_class"] == "TStreamerBasicPointer"]
    assert [(e["name"], e["count_name"]) for e in ptrs] == [
        ("fBasketEntry", "fMaxBaskets"),
        ("fBasketSeek", "fMaxBaskets"),
    ]
    # fType 40+16: pointer-to-Long64_t, the //[count] basic-pointer code
    assert all(e["ftype"] == 56 for e in ptrs)
    leaf_f = infos[3]
    assert leaf_f["cls"] == "TLeafF" and leaf_f["version"] == 1
    assert [e["type_name"] for e in leaf_f["elements"]] == ["Float_t", "Float_t"]


def test_streamer_byte_counts_and_class_tags():
    """Byte-level pins of the serialization: every record starts with a
    kByteCountMask'd count that EXACTLY covers the bytes after it, and
    class-tagged records carry kNewClassTag + NUL-terminated names (the
    TBufferFile layout)."""
    import struct

    from copperhead_spark.sources.streamerinfo import (
        K_BYTE_COUNT_MASK,
        K_NEW_CLASS_TAG,
        element,
        minimal_tree_streamers,
        streamer_list,
        tstreamerinfo,
    )

    blob = streamer_list(minimal_tree_streamers())
    (bc,) = struct.unpack_from(">I", blob, 0)
    assert bc & K_BYTE_COUNT_MASK
    assert (bc & ~K_BYTE_COUNT_MASK) == len(blob) - 4  # count covers the rest
    (version,) = struct.unpack_from(">H", blob, 4)
    assert version == 5  # TList
    one = tstreamerinfo("TTree", 20, [element("fEntries", 16, "Long64_t")])
    (bc1,) = struct.unpack_from(">I", one, 0)
    assert (bc1 & ~K_BYTE_COUNT_MASK) == len(one) - 4
    (tag,) = struct.unpack_from(">I", one, 4)
    assert tag == K_NEW_CLASS_TAG
    assert one[8 : 8 + 13] == b"TStreamerInfo" and one[8 + 13] == 0


def test_write_tree_with_streamers_header_and_compat(tmp_path):
    """write_tree(streamers=True): the header's fSeekInfo/fNbytesInfo
    point exactly at a TList key named StreamerInfo whose payload parses;
    readers (tree walk, chunked windows) are unaffected by the extra
    record; streamers=False keeps fSeekInfo = 0 (byte-compat with every
    existing fixture)."""
    import struct

    import numpy as np

    from copperhead_spark.sources import rootio
    from copperhead_spark.sources.streamerinfo import read_streamer_list

    vals = np.arange(300, dtype=np.float64)
    counts = np.ones(300, dtype=np.int32)
    for flag in (False, True):
        p = str(tmp_path / f"s{int(flag)}.root")
        rootio.write_tree(
            p, "Events", {"n": counts, "x": vals}, {"j": ("n", vals * 2)},
            basket_entries=64, compress=6, streamers=flag,
        )
        raw = open(p, "rb").read()
        seek_info, nbytes_info = struct.unpack_from(">ii", raw, 37)
        if not flag:
            assert (seek_info, nbytes_info) == (0, 0)
        else:
            k = rootio._read_key(raw, seek_info)
            assert (k.classname, k.name) == ("TList", "StreamerInfo")
            assert k.nbytes == nbytes_info
            infos = read_streamer_list(raw[k.data_pos : k.data_pos + k.datalen])
            # r11: the set grew (treeobj.tree_streamers) and now leads
            # with the attribute BASES the tree classes derive from
            classes = [i["cls"] for i in infos]
            assert classes.index("TAttLine") < classes.index("TTree")
            assert {"TTree", "TBranch", "TLeaf", "TLeafD", "TLeafI"} <= set(classes)
            tt = next(i for i in infos if i["cls"] == "TTree")
            assert tt["elements"][0]["element_class"] == "TStreamerBase"
        back = rootio.read_tree(p, "Events", ["x", "j"], 10, 200)
        assert np.array_equal(back["x"], vals[10:200])
        c, v = back["j"]
        assert np.array_equal(v, (vals * 2)[10:200])


def test_reclaim_bursty_gate_compares_unrounded(tmp_path):
    """r10: a 5.04% eviction duty rounds to the displayed 5.0 and the
    old `duty > 5.0` comparison missed it; the gate must compare the
    unrounded ratio (the refused r10 record displayed duty_pct 5.0 at a
    true 4.96% — correctly not bursty, but the miss window was real)."""
    import bench

    cases = [
        (1372, 68, 5.0, False),   # 4.956% -> displays 5.0, under the gate
        (10000, 504, 5.0, True),  # 5.04%  -> displays 5.0, OVER the gate
        (1000, 51, 5.1, True),
        (0, 0, 0.0, False),
    ]
    for samples, evicted, duty, bursty in cases:
        m = bench._ReclaimMonitor(str(tmp_path))
        m.samples, m.evicted = samples, evicted
        r = m.stop()
        assert r["duty_pct"] == duty, (samples, evicted)
        assert r["reclaim_bursty"] is bursty, (samples, evicted)


def test_unbinned_nll_fit_on_e2e_hpeak_mass(spark):
    """The UNBINNED leg of the e2e stage-3 parity (the reference's
    stage-3 fits are unbinned RooFit NLL fits of the collected mass
    column, stage3/fitter.py:131-229): stage2_unbinned reduces the ROOT
    e2e chain to the h-peak dimuon_mass column — O(selected events)
    driver-side, never the wide table — and the 4-family NLL menu fits
    it.  Pinned on the deterministic fixture: 45 selected events, every
    mass inside the h-peak window, all families finite, and the NLL gain
    over the uniform null < 1 nat (45 near-flat events in a 20 GeV
    window carry no resonance shape — a 'significant' fit here would
    mean the fitter is inventing structure)."""
    import math

    import numpy as np

    from copperhead_spark.finishing.nll import select_best_model_nll
    from copperhead_spark.pipeline import stage1_arrays, stage2_unbinned
    from copperhead_spark.plans.sources import root_events_scan

    flat = stage1_arrays(root_events_scan(spark, "/root/testdata/sf0.001"))
    rows = stage2_unbinned(flat.filter("region = 'h-peak'")).collect()
    x = np.array([r["dimuon_mass"] for r in rows])
    assert len(x) == 45
    assert x.min() >= 115.0 and x.max() < 135.0
    winner, results = select_best_model_nll(x, 115.0, 135.0, sweeps=6)
    assert sum(1 for r in results if math.isfinite(r.nll)) == 4
    assert winner.model == "bwGamma"  # deterministic fixture + fitter
    null_nll = len(x) * math.log(135.0 - 115.0)
    gain = null_nll - winner.nll
    assert 0.0 <= gain < 1.0, gain
