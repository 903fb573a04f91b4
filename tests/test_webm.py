"""EBML/Matroska walker: vint forms, signed relative timestamps,
keyframe flags, corruption postures."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.multimodal import (
    ebml_vint, encode_webm_blocks, parse_webm, read_ebml_vint)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2 ** 49))
def test_vint_roundtrip(v):
    b = ebml_vint(v)
    out, pos = read_ebml_vint(b, 0)
    assert out == v and pos == len(b)


def test_vint_widths():
    assert len(ebml_vint(126)) == 1          # < 127 fits one byte
    assert len(ebml_vint(127)) == 2          # all-ones reserved
    assert len(ebml_vint(16382)) == 2
    with pytest.raises(ValueError):
        read_ebml_vint(b"\x00\x01", 0)


def test_blocks_and_negative_rel_ts():
    clusters = [(0, [(0, True, b"\x10aa"), (40, False, b"\x20b")]),
                (1000, [(-20, True, b"\x30c")])]
    r = parse_webm(encode_webm_blocks(clusters, duration_ts=1000))
    assert [b["abs_ts"] for b in r["blocks"]] == [0, 40, 980]
    assert [b["key"] for b in r["blocks"]] == [True, False, True]
    assert r["n_clusters"] == 2 and r["track"] == 1


def test_bad_doctype_and_overrun():
    w = bytearray(encode_webm_blocks([(0, [(0, True, b"x")])]))
    i = bytes(w).index(b"webm")
    w[i:i + 4] = b"ogg\x00"
    with pytest.raises(ValueError):
        parse_webm(bytes(w))
    good = encode_webm_blocks([(0, [(0, True, b"x")])])
    with pytest.raises(ValueError):
        parse_webm(good[: len(good) - 2])


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 10 ** 6),
              st.lists(st.tuples(st.integers(-32768, 32767),
                                 st.booleans(),
                                 st.binary(min_size=1, max_size=20)),
                       min_size=1, max_size=5)),
    min_size=1, max_size=4))
def test_property_cluster_roundtrip(clusters):
    r = parse_webm(encode_webm_blocks(clusters))
    want = [(c + rel, k, p[0]) for c, bl in clusters
            for rel, k, p in bl]
    got = [(b["abs_ts"], b["key"], b["first_byte"]) for b in r["blocks"]]
    assert got == want
    assert r["n_clusters"] == len(clusters)
