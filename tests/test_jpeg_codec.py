"""Unit tests for the real baseline-JPEG entropy codec
(operators/jpegcodec.py) — pure numpy, no Spark session needed.

The codec's contract: flat blocks roundtrip bit-exactly (the DC basis
is constant, which is what the jpeg_decode_roundtrip value oracle
leans on); arbitrary content roundtrips within ±1 at quant=1 (float
transform pair, integer quantization round); out-of-subset streams
raise UnsupportedJpeg (fallback-to-probe taxonomy), corrupt ones raise
plain ValueError.
"""

from __future__ import annotations

import numpy as np
import pytest

from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
    UnsupportedJpeg, decode_baseline, encode_baseline_gray)
from precios_nexo_sperant_etl_spark.operators.multimodal import (
    decode_media_batch, probe_jpeg)


def _flat_image(vals, bw=2):
    px = np.zeros((8 * ((len(vals) + bw - 1) // bw), 8 * bw),
                  dtype=np.uint8)
    for k, v in enumerate(vals):
        by, bx = divmod(k, bw)
        px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
    return px


def test_flat_blocks_roundtrip_bit_exact():
    px = _flat_image([0, 7, 128, 255])
    d = decode_baseline(encode_baseline_gray(px))
    assert d["width"] == 16 and d["height"] == 16
    assert d["n_components"] == 1
    assert np.array_equal(d["pixels"], px)


def test_random_content_roundtrips_within_one():
    rng = np.random.RandomState(42)
    for _ in range(10):
        px = rng.randint(0, 256, size=(24, 32), dtype=np.uint8)
        d = decode_baseline(encode_baseline_gray(px))
        err = np.abs(d["pixels"].astype(int) - px.astype(int)).max()
        assert err <= 1


def test_byte_stuffing_is_exercised_and_survives():
    # seed 0 measurably produces 0xFF bytes in the entropy segment
    # (asserted, so the stuffing path can't silently stop being covered)
    px = np.random.RandomState(0).randint(0, 256, size=(16, 16),
                                          dtype=np.uint8)
    j = encode_baseline_gray(px)
    ecs = j[j.find(b"\xff\xda") + 14:-2]
    assert b"\xff\x00" in ecs
    d = decode_baseline(j)
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 1


def test_restart_markers_reset_dc_predictors():
    px = np.random.RandomState(7).randint(0, 256, size=(16, 64),
                                          dtype=np.uint8)
    j = encode_baseline_gray(px, restart_interval=3)
    assert any(bytes((0xFF, 0xD0 + i)) in j for i in range(8))
    d = decode_baseline(j)
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 1
    # and the stream differs from the unrestarted one but decodes equal
    d0 = decode_baseline(encode_baseline_gray(px))
    assert np.array_equal(d["pixels"], d0["pixels"])


def test_nontrivial_quant_table_is_lossy_but_bounded():
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    px = np.random.RandomState(3).randint(0, 256, size=(16, 16),
                                          dtype=np.uint8)
    d = decode_baseline(encode_baseline_gray(px, quant=q))
    err = np.abs(d["pixels"].astype(int) - px.astype(int)).max()
    assert 0 < err <= 8 * 16  # quantization loss, bounded by table scale


def test_progressive_decodes_for_real():
    from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
        encode_progressive_gray)
    px = _flat_image([50, 60, 70, 80])
    # flat blocks: bit-exact through DC shift+refine + EOB-run AC scan
    d = decode_baseline(encode_progressive_gray(px))
    assert np.array_equal(d["pixels"], px)
    # AC successive approximation: coarse Al=1 scan + G.2.3 refinement
    d2 = decode_baseline(encode_progressive_gray(px, ac_successive=True))
    assert np.array_equal(d2["pixels"], px)
    # random content: successive and single-pass AC scans reconstruct
    # identical coefficients, so identical pixels
    rng = np.random.RandomState(13)
    for _ in range(4):
        r = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
        a = decode_baseline(encode_progressive_gray(r))
        b = decode_baseline(encode_progressive_gray(r,
                                                    ac_successive=True))
        assert np.array_equal(a["pixels"], b["pixels"])
        assert np.abs(a["pixels"].astype(int) - r.astype(int)).max() <= 1
    # a baseline stream relabeled SOF2 is a LIAR: its single scan
    # declares Ss=0/Se=63, illegal for progressive DC — corrupt, not
    # unsupported
    j = encode_baseline_gray(px)
    with pytest.raises(ValueError):
        decode_baseline(j.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_arithmetic_sof_raises_unsupported():
    px = _flat_image([50, 60, 70, 80])
    j = encode_baseline_gray(px)
    with pytest.raises(UnsupportedJpeg):
        decode_baseline(j.replace(b"\xff\xc0", b"\xff\xc9", 1))


def test_single_component_sampling_factors_are_moot():
    # T.81 A.2: a single-component scan is non-interleaved and its
    # sampling factors only matter relative to Hmax/Vmax — which the
    # sole component defines. Declaring 2x2 must decode identically.
    px = _flat_image([50, 60, 70, 80])
    j = encode_baseline_gray(px)
    i = j.find(b"\xff\xc0")
    d = decode_baseline(j[:i + 11] + b"\x22" + j[i + 12:])
    assert np.array_equal(d["pixels"], px)


def test_fractional_subsampling_ratio_raises_unsupported():
    # 3-component frame where Hmax=3 is not divisible by H2=2: valid
    # per spec but pathological; falls back to the probe, not corrupt.
    from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
        encode_baseline_ycbcr)
    y = np.full((24, 24), 100, dtype=np.uint8)
    cb = np.full((24, 16), 90, dtype=np.uint8)
    cr = np.full((24, 8), 110, dtype=np.uint8)
    j = encode_baseline_ycbcr(y, cb, cr,
                              sampling=((3, 1), (2, 1), (1, 1)))
    with pytest.raises(UnsupportedJpeg):
        decode_baseline(j)


def test_ycbcr_420_and_422_flat_roundtrip_bit_exact():
    from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
        encode_baseline_ycbcr)
    y = _flat_image([10, 60, 110, 160, 210, 250, 30, 80], bw=4)  # 16x32
    cb = np.full((8, 16), 77, dtype=np.uint8)
    cr = np.full((8, 16), 140, dtype=np.uint8)
    d = decode_baseline(encode_baseline_ycbcr(y, cb, cr))
    assert d["sampling"] == [(2, 2), (1, 1), (1, 1)]
    assert np.array_equal(d["planes"][0], y)
    assert np.all(d["planes"][1] == 77) and np.all(d["planes"][2] == 140)
    assert d["planes"][1].shape == y.shape
    # 4:2:2 with restart markers: chroma half-width, full height
    cb2 = np.full((16, 16), 33, dtype=np.uint8)
    cr2 = np.full((16, 16), 201, dtype=np.uint8)
    d2 = decode_baseline(encode_baseline_ycbcr(
        y, cb2, cr2, sampling=((2, 1), (1, 1), (1, 1)),
        restart_interval=2))
    assert d2["sampling"] == [(2, 1), (1, 1), (1, 1)]
    assert np.array_equal(d2["planes"][0], y)
    assert np.all(d2["planes"][1] == 33) and np.all(d2["planes"][2] == 201)


def test_ycbcr_420_random_content_bounded_error():
    # Non-flat content through the subsampled path: luma within ±1
    # (quant=1); chroma flat per 2x2 so the box subsample is exact.
    from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
        encode_baseline_ycbcr)
    rng = np.random.RandomState(11)
    y = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    cb = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    cr = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    d = decode_baseline(encode_baseline_ycbcr(y, cb, cr,
                                              restart_interval=3))
    assert np.abs(d["planes"][0].astype(int) - y.astype(int)).max() <= 1
    up = np.repeat(np.repeat(cb, 2, 0), 2, 1)
    assert np.abs(d["planes"][1].astype(int) - up.astype(int)).max() <= 1


def test_metadata_only_stream_is_unsupported_not_corrupt():
    # SOI + SOF0 + EOI, no SOS: probe-able but not decodable
    import struct
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, 32, 48, 1) \
        + b"\x01\x11\x00"
    stream = b"\xff\xd8" + sof + b"\xff\xd9"
    with pytest.raises(UnsupportedJpeg):
        decode_baseline(stream)
    assert probe_jpeg(stream)["width"] == 48


def test_truncation_and_garbage_raise_valueerror():
    px = _flat_image([1, 2, 3, 4])
    j = encode_baseline_gray(px)
    with pytest.raises(ValueError):
        decode_baseline(j[:len(j) // 2])
    with pytest.raises(ValueError):
        decode_baseline(b"\x00\x01\x02")
    # Huffman garbage inside the ECS: flip entropy bytes
    i = j.find(b"\xff\xda") + 14
    bad = j[:i] + bytes(255 - b if b != 0xFF else b for b in j[i:-2]) \
        + j[-2:]
    with pytest.raises(ValueError):
        decode_baseline(bad)


def test_media_batch_dispatches_jpeg_pixels_and_fallback():
    import pandas as pd
    from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
        encode_progressive_gray)
    px = _flat_image([10, 20, 30, 40])
    full = encode_baseline_gray(px)
    progressive = encode_progressive_gray(px)
    arithmetic = full.replace(b"\xff\xc0", b"\xff\xc9", 1)
    out = decode_media_batch(pd.Series([full, progressive, arithmetic]))
    real, prog, probe = out.iloc[0], out.iloc[1], out.iloc[2]
    assert real["mime_detected"] == "image/jpeg"
    assert real["width"] == 16 and real["height"] == 16
    # luma mean of the four flat blocks: (10+20+30+40)/4 = 25
    assert real["mean_r_milli"] == 25_000
    # progressive now decodes to the same real pixel means (r8)
    assert prog["mime_detected"] == "image/jpeg"
    assert prog["mean_r_milli"] == 25_000
    # arithmetic-coded SOF stays honestly probed: dims, null means
    assert probe["mime_detected"] == "image/jpeg"
    assert probe["width"] == 16 and pd.isna(probe["mean_r_milli"])


def test_three_component_444_color_roundtrip():
    """The decoder handles 3-component 4:4:4 scans; build one by
    patching three grayscale scans' worth of structure is overkill —
    instead splice a color stream from the encoder's parts: encode the
    Y plane, then rewrite SOF/SOS for 3 identical components sharing
    the luminance tables. Cb=Cr=128 encodes as all-zero blocks, so the
    spliced stream is a legal 4:4:4 JPEG whose RGB equals the gray
    values exactly (1.402*0 = 0)."""
    import struct
    vals = [0, 64, 192, 255]
    px = _flat_image(vals)
    base = encode_baseline_gray(px)
    i = base.find(b"\xff\xc0")
    sof3 = struct.pack(">BBHBHHB", 0xFF, 0xC0, 17, 8, 16, 16, 3) \
        + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    j = base[:i] + sof3 + base[i + 13:]
    i = j.find(b"\xff\xda")
    sos3 = struct.pack(">BBH", 0xFF, 0xDA, 12) \
        + b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00"
    from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
        _BitWriter, _encode_codes, _magnitude_bits, _DCT_M, ZIGZAG,
        DC_LUM_BITS, DC_LUM_VALS, AC_LUM_BITS, AC_LUM_VALS)
    dc = _encode_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac = _encode_codes(AC_LUM_BITS, AC_LUM_VALS)
    eob = ac[0x00]
    wr = _BitWriter()
    pred = 0
    shifted = px.astype(np.float64) - 128.0
    for by in range(0, 16, 8):
        for bx in range(0, 16, 8):
            block = shifted[by:by + 8, bx:bx + 8]
            zz = np.round(_DCT_M @ block @ _DCT_M.T).astype(np.int64) \
                .reshape(64)[ZIGZAG]
            ssss, amp = _magnitude_bits(int(zz[0]) - pred)
            pred = int(zz[0])
            wr.put(dc[ssss][0], dc[ssss][1])      # Y DC category
            wr.put(amp, ssss)                     # Y DC amplitude
            wr.put(eob[0], eob[1])                # Y EOB (flat block)
            for _ in range(2):                    # two flat-128 chroma
                wr.put(dc[0][0], dc[0][1])        # DC diff 0
                wr.put(eob[0], eob[1])            # EOB
    wr.flush()
    j = j[:i] + sos3 + bytes(wr.out) + b"\xff\xd9"
    d = decode_baseline(j)
    assert d["n_components"] == 3
    assert d["pixels"].shape == (16, 16, 3)
    for k, v in enumerate(vals):
        by, bx = divmod(k, 2)
        blk = d["pixels"][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
        assert (blk == v).all()
