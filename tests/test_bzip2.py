"""bzip2 codec (r11): from-scratch decoder + subset encoder, pinned
BOTH directions against the independent stdlib bz2 implementation —
their encoder (levels 1 and 9, multi-group Huffman, big blocks) must
decode here; our streams must decompress there. Shared-table bugs
cannot hide in a self-roundtrip (the r10 zstd lesson)."""

from __future__ import annotations

import bz2
import random

import pytest

from precios_nexo_sperant_etl_spark.operators.bzip2 import (
    Bzip2Error, decode_bzip2, encode_bzip2)

rng = random.Random(42)

CASES = [
    b"hello world",
    b"a" * 1000,                                # long single-byte runs
    bytes(rng.randrange(256) for _ in range(5000)),   # full alphabet
    b"the quick brown fox " * 400,              # textual, repetitive
    bytes(rng.choice(b"abcd") for _ in range(100000)),  # multi-block ours
    b"\x00" * 4,                                # exactly one RLE1 unit
    b"\x00" * 259,                              # max RLE1 run
    b"x",
    b"ab" * 50000,
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_stdlib_encoder_to_our_decoder(case):
    c = CASES[case]
    for lvl in (1, 9):
        d = decode_bzip2(bz2.compress(c, lvl))
        assert d["content"] == c
        assert d["n_streams"] == 1


@pytest.mark.parametrize("case", range(len(CASES)))
def test_our_encoder_to_stdlib_decoder(case):
    c = CASES[case]
    enc = encode_bzip2(c)
    assert bz2.decompress(enc) == c
    assert decode_bzip2(enc)["content"] == c


def test_multistream_wikipedia_layout():
    ms = bz2.compress(b"stream-one ") + bz2.compress(b"stream-two")
    d = decode_bzip2(ms)
    assert d["content"] == b"stream-one stream-two"
    assert d["n_streams"] == 2 and d["n_blocks"] == 2
    mixed = encode_bzip2(b"ours-one ") + bz2.compress(b"theirs-two")
    assert decode_bzip2(mixed)["content"] == b"ours-one theirs-two"


def test_hypothesis_style_fuzz_roundtrip():
    r = random.Random(7)
    for _ in range(40):
        n = r.randrange(1, 4000)
        c = bytes(r.randrange(256) for _ in range(n)) \
            if r.random() < 0.5 else \
            bytes(r.choice(b"aabbbcx\x00") for _ in range(n))
        assert bz2.decompress(encode_bzip2(c)) == c
        assert decode_bzip2(bz2.compress(c))["content"] == c


def test_corruption_is_loud():
    enc = bytearray(encode_bzip2(b"payload " * 100))
    with pytest.raises(Bzip2Error):
        decode_bzip2(bytes(enc[:-6]) + b"\x00" * 6)   # clobber EOS/CRC
    bad = bytearray(bz2.compress(b"payload " * 100))
    bad[20] ^= 0xFF                                   # flip data bits
    with pytest.raises(Bzip2Error):
        decode_bzip2(bytes(bad))
    with pytest.raises(Bzip2Error):
        decode_bzip2(b"notbzip2")
    with pytest.raises(Bzip2Error):
        encode_bzip2(b"")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=3000))
    def test_hyp_our_encoder_stdlib_decodes(data):
        assert bz2.decompress(encode_bzip2(data)) == data

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=3000), st.sampled_from([1, 9]))
    def test_hyp_stdlib_encoder_we_decode(data, lvl):
        assert decode_bzip2(bz2.compress(data, lvl))["content"] == data
except ImportError:  # pragma: no cover
    pass
