"""IMA ADPCM WAV codec: container roundtrip, automaton invariants,
and corruption postures. No Spark session needed."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.multimodal import (
    _IMA_STEPS, decode_wav_ima, encode_wav_ima, ima_adpcm_expand)


def test_step_table_is_the_public_constant():
    assert len(_IMA_STEPS) == 89
    assert _IMA_STEPS[0] == 7 and _IMA_STEPS[88] == 32767
    assert all(a < b for a, b in zip(_IMA_STEPS, _IMA_STEPS[1:]))


def test_known_transition():
    # nibble 3 at index 0: step=7, diff=7//8 + 7//2 + 7//4 = 0+3+1=4
    assert ima_adpcm_expand([3], 100, 0) == [104]
    # sign bit: nibble 11 = 8|3 -> -4
    assert ima_adpcm_expand([11], 100, 0) == [96]


def test_roundtrip_two_blocks():
    blocks = [(-2000, 5, [i % 16 for i in range(64)]),
              (1234, 88, [(3 * i) % 16 for i in range(64)])]
    r = decode_wav_ima(encode_wav_ima(blocks))
    assert r["n_blocks"] == 2 and r["samples_per_block"] == 65
    assert len(r["samples"]) == 130
    assert r["samples"][0] == -2000 and r["samples"][65] == 1234
    assert r["samples"][1:65] == ima_adpcm_expand(blocks[0][2], -2000, 5)


def test_fact_mismatch_raises():
    wav = bytearray(encode_wav_ima([(0, 0, [7] * 64)]))
    i = wav.find(b"fact")
    wav[i + 8:i + 12] = struct.pack("<I", 9999)
    with pytest.raises(ValueError):
        decode_wav_ima(bytes(wav))


def test_bad_seed_index_raises():
    wav = bytearray(encode_wav_ima([(0, 0, [7] * 64)]))
    i = wav.find(b"data")
    wav[i + 10] = 90                      # seed index byte > 88
    with pytest.raises(ValueError):
        decode_wav_ima(bytes(wav))


@settings(max_examples=30, deadline=None)
@given(st.integers(-32768, 32767), st.integers(0, 88),
       st.lists(st.integers(0, 15), min_size=2, max_size=64)
         .filter(lambda v: len(v) % 2 == 0))
def test_property_clamped_and_container_stable(pred0, idx0, nibs):
    out = ima_adpcm_expand(nibs, pred0, idx0)
    assert all(-32768 <= s <= 32767 for s in out)
    r = decode_wav_ima(encode_wav_ima([(pred0, idx0, nibs)]))
    assert r["samples"] == [pred0] + out
