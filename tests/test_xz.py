"""xz/LZMA2/LZMA decoder (r11): from-scratch adaptive range decoding
pinned against the independent stdlib lzma encoder — every preset tier
(0/6/9e exercise different chunk shapes and match finders), every
check type (CRC32/CRC64/SHA-256/none), custom lc/lp/pb literal
contexts, and multistream concatenation. Decode-only by design: there
is no self-roundtrip at all, so nothing can hide in shared tables."""

from __future__ import annotations

import lzma
import random

import pytest

from precios_nexo_sperant_etl_spark.operators.xzlzma import (
    XzError, crc64_xz, decode_xz)

rng = random.Random(42)

CASES = [
    b"hello world",
    b"a" * 100000,
    bytes(rng.randrange(256) for _ in range(5000)),
    b"the quick brown fox jumps over the lazy dog " * 4000,
    bytes(rng.choice(b"abcd") for _ in range(200000)),
    b"x",
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_all_check_types(case):
    c = CASES[case]
    for check, nm in ((lzma.CHECK_CRC32, "crc32"),
                      (lzma.CHECK_CRC64, "crc64"),
                      (lzma.CHECK_SHA256, "sha256"),
                      (lzma.CHECK_NONE, "none")):
        d = decode_xz(lzma.compress(c, format=lzma.FORMAT_XZ, check=check))
        assert d["content"] == c
        assert d["checks"] == [nm]


@pytest.mark.parametrize("preset", [0, 1, 6, 9 | lzma.PRESET_EXTREME])
def test_presets(preset):
    for c in CASES:
        assert decode_xz(lzma.compress(c, preset=preset))["content"] == c


def test_custom_literal_contexts():
    c = b"structured " * 9000
    for lc, lp, pb in ((0, 2, 1), (4, 0, 0), (1, 1, 2), (0, 0, 0)):
        flt = [{"id": lzma.FILTER_LZMA2, "preset": 6,
                "lc": lc, "lp": lp, "pb": pb}]
        blob = lzma.compress(c, format=lzma.FORMAT_XZ, filters=flt)
        assert decode_xz(blob)["content"] == c


def test_multistream():
    ms = lzma.compress(b"stream-one ") + lzma.compress(b"stream-two")
    d = decode_xz(ms)
    assert d["content"] == b"stream-one stream-two"
    assert d["n_streams"] == 2 and d["n_blocks"] == 2


def test_fuzz_vs_stdlib():
    r = random.Random(7)
    for _ in range(30):
        n = r.randrange(1, 20000)
        c = bytes(r.randrange(256) for _ in range(n)) \
            if r.random() < 0.5 else \
            bytes(r.choice(b"aabbbcx\x00\xff") for _ in range(n))
        assert decode_xz(lzma.compress(c))["content"] == c


def test_crc64_known_vector():
    # xz's CRC64 (ECMA-182 reflected): public check value for
    # "123456789"
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA


def test_corruption_is_loud():
    blob = bytearray(lzma.compress(b"payload " * 1000))
    blob[30] ^= 0xFF
    with pytest.raises(XzError):
        decode_xz(bytes(blob))
    with pytest.raises(XzError):
        decode_xz(b"not an xz stream")
    good = lzma.compress(b"payload")
    with pytest.raises(XzError):
        decode_xz(good[:-4])              # truncated footer


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=5000),
           st.sampled_from([0, 6, 9]))
    def test_hyp_stdlib_xz_we_decode(data, preset):
        assert decode_xz(lzma.compress(data, preset=preset))["content"] \
            == data
except ImportError:  # pragma: no cover
    pass


def test_lzma_alone_legacy_format():
    """Legacy .lzma (FORMAT_ALONE): unknown-size, end-marker-terminated
    single stream — the marker path LZMA2 never exercises."""
    from precios_nexo_sperant_etl_spark.operators.xzlzma import (
        decode_lzma_alone)
    r = random.Random(3)
    for c in [b"hello", b"a" * 50000, b"",
              bytes(r.randrange(256) for _ in range(7000)),
              b"repeat " * 3000]:
        for preset in (1, 6, 9):
            blob = lzma.compress(c, format=lzma.FORMAT_ALONE,
                                 preset=preset)
            assert decode_lzma_alone(blob) == c
    with pytest.raises(XzError):
        decode_lzma_alone(b"\x5d\x00\x00\x01\x00")        # truncated
    good = bytearray(lzma.compress(b"x" * 500, format=lzma.FORMAT_ALONE))
    with pytest.raises(XzError):
        decode_lzma_alone(bytes(good[:-10]))              # no end marker
