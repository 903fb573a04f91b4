"""From-scratch DEFLATE/zlib/gzip (r11), pinned both directions
against the independent stdlib zlib/gzip implementations across every
compression level (0 = stored blocks, 1/6/9 = different match-finder
behaviors and dynamic-table shapes)."""

from __future__ import annotations

import gzip as gz
import random
import zlib

import pytest

from precios_nexo_sperant_etl_spark.operators.deflatecodec import (
    DeflateError, adler32, crc32, deflate, gzip_compress,
    gzip_decompress, inflate, zlib_compress, zlib_decompress)

rng = random.Random(42)

CASES = [
    b"",
    b"x",
    b"hello world hello world hello",
    b"a" * 10000,
    bytes(rng.randrange(256) for _ in range(8000)),
    b"the quick brown fox " * 1000,
    bytes(rng.choice(b"ab") for _ in range(50000)),
    b"\x00" * 70000,                 # > one stored-block chunk
]


def test_public_check_vectors():
    assert adler32(b"Wikipedia") == 0x11E60398
    assert crc32(b"123456789") == zlib.crc32(b"123456789")
    assert adler32(b"") == 1


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_stdlib_encoder_our_inflate(case, level):
    c = CASES[case]
    assert inflate(zlib.compress(c, level)[2:-4]) == c
    if level == 6:
        assert zlib_decompress(zlib.compress(c, 6)) == c
        assert gzip_decompress(gz.compress(c)) == c


@pytest.mark.parametrize("case", range(len(CASES)))
def test_our_encoder_stdlib_decodes(case):
    c = CASES[case]
    assert zlib.decompress(zlib_compress(c)) == c
    assert gz.decompress(gzip_compress(c)) == c
    assert inflate(deflate(c)) == c


def test_gzip_header_variants():
    # FNAME + FCOMMENT + FEXTRA headers all skip correctly
    import io
    buf = io.BytesIO()
    with gz.GzipFile(fileobj=buf, mode="wb", filename="member.txt",
                     mtime=123456) as f:
        f.write(b"named payload")
    assert gzip_decompress(buf.getvalue()) == b"named payload"


def test_corruption_is_loud():
    blob = bytearray(zlib_compress(b"payload " * 500))
    blob[-1] ^= 0xFF
    with pytest.raises(DeflateError):
        zlib_decompress(bytes(blob))
    g = bytearray(gzip_compress(b"payload " * 500))
    g[-6] ^= 0xFF
    with pytest.raises(DeflateError):
        gzip_decompress(bytes(g))
    with pytest.raises(DeflateError):
        inflate(b"\x07")             # reserved block type


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=4000))
    def test_hyp_our_deflate_stdlib_inflates(data):
        assert zlib.decompress(zlib_compress(data)) == data

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=4000),
           st.sampled_from([0, 1, 6, 9]))
    def test_hyp_stdlib_deflate_we_inflate(data, lvl):
        assert inflate(zlib.compress(data, lvl)[2:-4]) == data
except ImportError:  # pragma: no cover
    pass
