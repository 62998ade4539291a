"""Real-decoder seam contract (VERDICT r3 #8).

The multimodal decode contract (operators/multimodal.decode_media) is
pluggable; until now only the deterministic char-semantics fake was
exercised.  These tests plug a REAL numpy-based netpbm decoder through
the seam — no PIL/ffmpeg needed — and prove:

1. decode_media ships the swapped decoder through Arrow mapInPandas
   unchanged (schema, batching, row alignment) and the decoded features
   are exactly what numpy says about the real image bytes;
2. mm_image_resize's gather arithmetic produces the SAME pixels as a
   numpy nearest-neighbor resize of the really-decoded grid — i.e. the
   plan is a faithful resize, not just internally consistent;
3. the override is an override: clearing it restores the fake-decoder
   semantics the registered oracles pin.

No plan code is touched anywhere here — that is the point.
"""

import numpy as np

from copperhead_spark.operators import multimodal as mm


def _make_p6(doc_id: int, w: int = 8, h: int = 4):
    """Deterministic P6 (binary RGB) image with a header comment."""
    arr = (np.arange(w * h * 3, dtype=np.int64) * (doc_id + 3) % 256).astype(np.uint8)
    header = f"P6\n# synthetic {doc_id}\n{w} {h}\n255\n".encode()
    return header + arr.tobytes(), arr.reshape((h, w, 3))


def _make_p5(doc_id: int, w: int = 8, h: int = 4):
    """Deterministic P5 (binary grayscale) image, samples in the
    printable-ASCII band so the same values can ride a text column."""
    arr = (32 + (np.arange(w * h, dtype=np.int64) * (doc_id + 7)) % 95).astype(
        np.uint8
    )
    header = f"P5\n{w} {h}\n255\n".encode()
    return header + arr.tobytes(), arr.reshape((h, w))


def test_ppm_parser_handles_headers():
    payload, arr = _make_p6(1)
    assert np.array_equal(mm.ppm_pixels(payload), arr)
    payload, arr = _make_p5(2)
    assert np.array_equal(mm.ppm_pixels(payload), arr)
    d = mm.ppm_decode(_make_p6(3)[0])
    assert (d["width"], d["height"], d["n_frames"]) == (8, 4, 1)
    assert d["pixel_sum"] == int(_make_p6(3)[1].sum())


def test_real_decoder_seam_through_decode_media(spark):
    """Swap ppm_decode in via set_decoder, run the SAME decode_media
    operator the registered query uses, get numpy's truth back."""
    cases = [_make_p6(i) for i in range(24)]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(cases)],
        "doc_id long, payload binary",
    ).repartition(4)
    mm.set_decoder(mm.ppm_decode)
    try:
        got = {r.doc_id: r for r in mm.decode_media(df).collect()}
    finally:
        mm.set_decoder(None)
    assert len(got) == len(cases)
    for i, (payload, arr) in enumerate(cases):
        r = got[i]
        assert (r.byte_len, r.width, r.height, r.n_frames, r.pixel_sum) == (
            len(payload),
            8,
            4,
            1,
            int(arr.sum()),
        ), i


def test_override_is_reversible(spark):
    """With the override cleared, decode_media falls back to the fake
    decoder whose semantics the registered oracles pin."""
    payload = b"hello multimodal"
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    )
    mm.set_decoder(mm.ppm_decode)
    mm.set_decoder(None)
    r = mm.decode_media(df).collect()[0]
    want = mm.fake_decode(payload)
    assert (r.byte_len, r.width, r.height, r.n_frames, r.pixel_sum) == (
        want["byte_len"],
        want["width"],
        want["height"],
        want["n_frames"],
        want["pixel_sum"],
    )


def test_resize_plan_matches_numpy_on_real_pixels(spark, tmp_path):
    """mm_image_resize (UNTOUCHED plan code) applied to a corpus whose
    char codes equal a really-decoded P5 grid produces exactly numpy's
    nearest-neighbor resize of that grid: grid[::2, ::2] for the
    8x4 -> 4x2 factor-2 downsample."""
    from copperhead_spark.plans.registry import all_queries

    cases = [_make_p5(i) for i in range(16)]
    # text column carrying the decoded samples as chars (values are in
    # the printable band by construction)
    docs = spark.createDataFrame(
        [
            (i, "".join(chr(int(v)) for v in arr.reshape(-1)))
            for i, (_, arr) in enumerate(cases)
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r.doc_id: r
        for r in all_queries()["mm_image_resize"].builder(spark, sf).collect()
    }
    for i, (payload, _) in enumerate(cases):
        grid = mm.ppm_pixels(payload)  # decode the REAL bytes
        expect = grid[::2, ::2].reshape(-1).astype(np.int64)
        r = out[i]
        assert (r.out_w, r.out_h) == (4, 2)
        # pixels cross the driver gate comma-serialized (raw ARRAY output
        # columns are not driver-hashable)
        assert r.pixels == ",".join(str(v) for v in expect), i
        assert r.pixel_sum == int(expect.sum())


# ---------------------------------------------------------------------------
# round 7: WAV/RIFF parser + netpbm-stream frame sampler (real codecs)
# ---------------------------------------------------------------------------


def test_wav_round_trip_16bit_signed():
    import numpy as np

    from copperhead_spark.operators.multimodal import wav_encode, wav_samples

    want = np.array([0, 1, -1, 32767, -32768, 47, -79], dtype=np.int64)
    smp, rate, nch, bits = wav_samples(wav_encode(want, sample_rate=8000, bits=16))
    assert (rate, nch, bits) == (8000, 1, 16)
    assert np.array_equal(smp, want)  # sign + LE byte order exact


def test_wav_round_trip_8bit_and_odd_pad():
    import numpy as np

    from copperhead_spark.operators.multimodal import wav_encode, wav_samples

    want = np.array([0, 255, 128], dtype=np.int64)  # 3 bytes -> odd data chunk
    payload = wav_encode(want, sample_rate=44100, bits=8)
    assert len(payload) % 2 == 0  # RIFF pad byte appended
    smp, rate, nch, bits = wav_samples(payload)
    assert (rate, nch, bits) == (44100, 1, 8)
    assert np.array_equal(smp, want)


def test_wav_skips_unknown_chunks():
    import struct

    import numpy as np

    from copperhead_spark.operators.multimodal import wav_encode, wav_samples

    base = wav_encode(np.array([5, -5]), bits=16)
    # splice a LIST chunk between fmt and data
    fmt_end = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    smp, *_ = wav_samples(spliced)
    assert list(smp) == [5, -5]


def test_wav_malformed_raises():
    import struct

    import numpy as np
    import pytest

    from copperhead_spark.operators.multimodal import wav_encode, wav_samples

    ok = wav_encode(np.array([1, 2, 3]), bits=16)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        wav_samples(b"OggS" + ok[4:])
    with pytest.raises(ValueError, match="truncated"):
        wav_samples(ok[:-3])  # data chunk shorter than declared
    # non-PCM format code
    bad = bytearray(ok)
    fmt_off = ok.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off, 3)  # IEEE float
    with pytest.raises(ValueError, match="PCM"):
        wav_samples(bytes(bad))
    with pytest.raises(ValueError, match="fmt"):
        wav_samples(ok[:12])  # no chunks at all


def _p5(w, h, vals):
    return f"P5\n{w} {h}\n255\n".encode() + bytes(vals)


def test_split_frames_variable_sizes():
    from copperhead_spark.operators.multimodal import split_frames

    a = _p5(2, 2, [1, 2, 3, 4])
    b = _p5(3, 1, [9, 8, 7])
    assert split_frames(a + b) == [a, b]
    assert split_frames(b"") == []


def test_split_frames_trailing_garbage_raises():
    import pytest

    from copperhead_spark.operators.multimodal import split_frames

    a = _p5(2, 2, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        split_frames(a + b"XX")
    with pytest.raises(ValueError):
        split_frames(a[:-1])  # truncated raster


def test_frame_sample_stride_and_sums(spark):
    from copperhead_spark.operators.multimodal import frame_sample

    stream = _p5(2, 1, [10, 20]) + _p5(2, 1, [1, 1]) + _p5(1, 1, [7])
    df = spark.createDataFrame([(1, bytearray(stream))], "doc_id long, payload binary")
    rows = {r.frame_idx: r for r in frame_sample(df, every_n=2).collect()}
    assert set(rows) == {0, 2}  # stride skips frame 1
    assert rows[0].n_frames == 3 and rows[0].pixel_sum == 30
    assert rows[2].width == 1 and rows[2].pixel_sum == 7
    one = frame_sample(df, every_n=1).collect()
    assert sorted(r.frame_idx for r in one) == [0, 1, 2]
