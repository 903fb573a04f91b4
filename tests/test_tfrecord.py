"""TFRecord/protobuf-Example codec: public CRC32C vectors, wire-format
roundtrips (negative varints, packed floats), corruption postures."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.tfrecord import (
    crc32c, decode_example, encode_example, frame_records, masked_crc,
    read_records)


def test_crc32c_public_vectors():
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283      # the check value
    assert crc32c(b"\x00" * 32) == 0x8A9136AA      # RFC 3720 B.4
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_masked_crc_is_reversible_rotation():
    c = crc32c(b"payload")
    m = masked_crc(b"payload")
    um = (m - 0xA282EAD8) & 0xFFFFFFFF
    assert ((um >> 17) | (um << 15)) & 0xFFFFFFFF == c


def test_example_negative_int64_ten_byte_varint():
    ex = encode_example({"v": [-1, -(2 ** 62), 2 ** 62]})
    assert decode_example(ex)["v"] == [-1, -(2 ** 62), 2 ** 62]


def test_corrupt_data_crc_raises_and_verify_off_passes():
    shard = bytearray(frame_records([encode_example({"v": [1, 2]})]))
    shard[-5] ^= 0x40                    # flip a payload bit
    with pytest.raises(ValueError):
        read_records(bytes(shard))
    assert len(read_records(bytes(shard), verify=False)) == 1


def test_corrupt_length_crc_raises():
    shard = bytearray(frame_records([encode_example({"v": [1]})]))
    shard[8] ^= 1                        # length CRC byte
    with pytest.raises(ValueError):
        read_records(bytes(shard))


def test_truncation_raises():
    shard = frame_records([encode_example({"v": [1, 2, 3]})])
    for cut in (4, 11, len(shard) - 2):
        with pytest.raises(ValueError):
            read_records(shard[:cut])


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcdef_", min_size=1, max_size=8),
    st.one_of(
        st.binary(max_size=40),
        st.lists(st.integers(-2 ** 63, 2 ** 63 - 1), min_size=1,
                 max_size=8),
        st.lists(st.sampled_from([0.0, 0.5, 1.25, -3.75, 1024.0]),
                 min_size=1, max_size=6)),
    min_size=1, max_size=5))
def test_property_example_roundtrip(features):
    assert decode_example(encode_example(features)) == features


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(max_size=200), min_size=1, max_size=10))
def test_property_framing_roundtrip(records):
    assert read_records(frame_records(records)) == records
