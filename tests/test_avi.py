"""RIFF/AVI container codec: genuine MJPEG-in-AVI roundtrips plus the
corruption postures a crawl pipeline needs (idx1 mismatch -> flag, not
raise; truncation -> raise). No Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
    decode_baseline, encode_baseline_gray)
from precios_nexo_sperant_etl_spark.operators.multimodal import (
    encode_avi_mjpeg, parse_avi)


def _frames(n: int, seed: int) -> list[bytes]:
    out = []
    for f in range(n):
        px = np.full((16, 16), (seed * 31 + 13 * f) % 256, dtype=np.uint8)
        out.append(encode_baseline_gray(px))
    return out


def test_roundtrip_metadata_and_frames():
    frames = _frames(5, 7)
    avi = encode_avi_mjpeg(frames, 16, 16, us_per_frame=40000)
    r = parse_avi(avi)
    assert r["width"] == 16 and r["height"] == 16
    assert r["total_frames"] == 5 and len(r["frames"]) == 5
    assert r["us_per_frame"] == 40000 and r["fps_milli"] == 25000
    assert r["idx_consistent"] is True
    assert r["frames"] == frames
    for f, fr in enumerate(r["frames"]):
        px = decode_baseline(fr)["pixels"]
        assert int(px[0, 0]) == (7 * 31 + 13 * f) % 256


def test_odd_size_chunk_padding():
    # force an odd-length frame payload: flat JPEGs vary, so append a
    # COM-like tail byte via a raw odd body in a second frame
    frames = _frames(3, 11)
    odd = [fr + b"\x00" if len(fr) % 2 == 0 else fr for fr in frames]
    avi = encode_avi_mjpeg(odd, 16, 16)
    r = parse_avi(avi)
    assert r["frames"] == odd and r["idx_consistent"] is True


def test_idx1_mismatch_flags_not_raises():
    frames = _frames(4, 3)
    avi = bytearray(encode_avi_mjpeg(frames, 16, 16))
    i = avi.rfind(b"idx1")
    # corrupt the first index entry's size field (id at i+8, size at +20)
    (sz,) = struct.unpack("<I", avi[i + 20:i + 24])
    avi[i + 20:i + 24] = struct.pack("<I", sz + 1)
    r = parse_avi(bytes(avi))
    assert r["idx_consistent"] is False
    assert len(r["frames"]) == 4          # movi walk is authoritative


def test_truncation_raises():
    avi = encode_avi_mjpeg(_frames(2, 5), 16, 16)
    with pytest.raises(ValueError):
        parse_avi(avi[: len(avi) // 2])
    with pytest.raises(ValueError):
        parse_avi(b"RIFX" + avi[4:])


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 8), st.integers(0, 2 ** 31 - 1),
       st.sampled_from([20000, 40000, 60000]))
def test_property_any_count_any_clock(n, seed, uspf):
    frames = _frames(n, seed % 997)
    r = parse_avi(encode_avi_mjpeg(frames, 16, 16, us_per_frame=uspf))
    assert len(r["frames"]) == n == r["total_frames"]
    assert r["us_per_frame"] == uspf
    assert r["fps_milli"] == 1_000_000_000 // uspf
    assert r["idx_consistent"] and r["frames"] == frames
