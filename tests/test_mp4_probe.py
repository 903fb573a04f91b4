"""Unit tests for the real ISO-BMFF box walker
(operators/multimodal.probe_mp4) — pure bytes, no Spark session.

Covers the framing variants a real corpus throws at the probe: 32-bit
sizes, 64-bit largesize escapes, size-0 to-EOF boxes, uuid extensions,
mvhd/tkhd version 0 and 1, multiple tracks, and the corrupt taxonomy
(overrunning boxes, missing moov).
"""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from precios_nexo_sperant_etl_spark.operators.multimodal import (
    decode_media_batch, probe_mp4)


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def _mvhd_v0(ts: int, dur: int) -> bytes:
    body = (b"\x00\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">II", ts, dur)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24
            + struct.pack(">I", 2))
    return _box(b"mvhd", body)


def _tkhd_v0(w: int, h: int) -> bytes:
    body = (b"\x00\x00\x00\x07" + b"\x00" * 8 + struct.pack(">I", 1)
            + b"\x00" * 4 + struct.pack(">I", 600) + b"\x00" * 8
            + b"\x00" * 8 + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16))
    return _box(b"tkhd", body)


FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 512))


def _movie(ts=600, dur=1800, tracks=((640, 360),), mdat=b"x" * 137):
    moov = _mvhd_v0(ts, dur) + b"".join(
        _box(b"trak", _tkhd_v0(w, h)) for w, h in tracks)
    return FTYP + _box(b"mdat", mdat) + _box(b"moov", moov)


def test_probe_reads_movie_and_first_sized_track():
    p = _movie(tracks=((0, 0), (1920, 1080)))
    d = probe_mp4(p)
    assert d["brand"] == "isom"
    assert d["timescale"] == 600 and d["duration_ms"] == 3000
    assert d["n_tracks"] == 2
    # first track is 0x0 (audio-style): dimensions come from the second
    assert (d["width"], d["height"]) == (1920, 1080)
    assert d["byte_len"] == len(p)


def test_largesize_and_to_eof_boxes():
    big_mdat = (struct.pack(">I", 1) + b"mdat"
                + struct.pack(">Q", 16 + 21) + b"y" * 21)
    moov = _mvhd_v0(1000, 2500)
    p = FTYP + big_mdat + struct.pack(">I", 0) + b"moov" + moov
    d = probe_mp4(p)
    assert d["duration_ms"] == 2500
    assert d["width"] is None  # no trak at all


def test_uuid_extension_box_is_skipped():
    uuid_box = _box(b"uuid", b"\x11" * 16 + b"opaque-vendor-data")
    p = FTYP + uuid_box + _box(b"moov", _mvhd_v0(600, 600))
    assert probe_mp4(p)["duration_ms"] == 1000


def test_mvhd_v1_64bit_duration():
    body = (b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">I", 90000) + struct.pack(">Q", 450000)
            + b"\x00" * 80)
    d = probe_mp4(_box(b"moov", _box(b"mvhd", body)))
    assert d["timescale"] == 90000 and d["duration_ms"] == 5000


def test_tkhd_v1_offsets():
    body = (b"\x01\x00\x00\x07" + b"\x00" * 16 + struct.pack(">I", 1)
            + b"\x00" * 4 + struct.pack(">Q", 600) + b"\x00" * 8
            + b"\x00" * 8 + b"\x00" * 36
            + struct.pack(">II", 320 << 16, 240 << 16))
    moov = _mvhd_v0(600, 600) + _box(b"trak", _box(b"tkhd", body))
    d = probe_mp4(_box(b"moov", moov))
    assert (d["width"], d["height"]) == (320, 240)


def test_corrupt_taxonomy():
    p = _movie()
    with pytest.raises(ValueError):
        probe_mp4(p[:-5])                       # moov overruns
    with pytest.raises(ValueError):
        probe_mp4(FTYP + _box(b"mdat", b"x"))   # no moov/mvhd
    with pytest.raises(ValueError):
        probe_mp4(b"\x00\x00")                  # too short


def test_media_batch_dispatches_mp4():
    out = decode_media_batch(pd.Series([_movie(), FTYP + b"\x00\x00"]))
    ok, bad = out.iloc[0], out.iloc[1]
    assert ok["mime_detected"] == "video/mp4"
    assert ok["width"] == 640 and ok["duration_ms"] == 3000
    assert ok["channels"] == 1  # n_tracks rides the channels column
    assert bad["mime_detected"] == "corrupt/mp4"


# --- PCM frame features (same file: the round's media additions) ----------

def test_wav_samples_and_frame_features():
    import numpy as np
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        pcm_frame_features, wav_samples)

    sig = np.array([100, -200, 300, -400] * 40, dtype="<i2")  # 160 samples
    data = sig.tobytes()
    hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + len(data).to_bytes(4, "little") + data)
    x = wav_samples(hdr)
    assert x.shape == (160, 1)
    assert (x[:4, 0] == [100, -200, 300, -400]).all()

    r = pcm_frame_features(x[:, 0], frame=64, voiced_threshold=50_000)
    assert r["n_samples"] == 160 and r["n_frames"] == 2  # tail 32 dropped
    # every sample alternates sign: 159 crossings
    assert r["zero_crossings"] == 159
    # both complete frames have identical energy; first peak wins
    expected_e = (np.array([100, -200, 300, -400] * 16, dtype=np.int64)
                  ** 2).sum() // 64
    assert r["max_energy"] == expected_e
    assert r["peak_frame"] == 0
    assert r["voiced_frames"] == (2 if expected_e > 50_000 else 0)

    # empty and sub-frame signals
    r0 = pcm_frame_features(np.array([], dtype=np.int64), frame=64)
    assert r0["n_frames"] == 0 and r0["max_energy"] is None
    assert r0["zero_crossings"] == 0 and r0["voiced_frames"] == 0

    r1 = pcm_frame_features(np.array([5, -5, 5], dtype=np.int64), frame=64)
    assert r1["n_frames"] == 0 and r1["zero_crossings"] == 2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        wav_samples(b"RIFF\x00\x00\x00\x00WAVEjunk")


# --- TIFF/EXIF probe -------------------------------------------------------

def _tiff_le(w, h, orient, dt=None):
    n = 4 if dt else 3
    hdr = b"II" + struct.pack("<HI", 42, 8)
    e = struct.pack("<HHI", 0x0100, 4, 1) + struct.pack("<I", w)
    e += struct.pack("<HHI", 0x0101, 4, 1) + struct.pack("<I", h)
    e += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", orient, 0)
    sub_off = 8 + 2 + 12 * n + 4
    if dt:
        e += struct.pack("<HHI", 0x8769, 4, 1) + struct.pack("<I", sub_off)
    body = hdr + struct.pack("<H", n) + e + struct.pack("<I", 0)
    if dt:
        s = dt.encode() + b"\x00"
        dt_off = sub_off + 2 + 12 + 4
        body += (struct.pack("<H", 1)
                 + struct.pack("<HHI", 0x9003, 2, len(s))
                 + struct.pack("<I", dt_off) + struct.pack("<I", 0) + s)
    return body


def test_exif_probe_le_with_subifd_datetime():
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        probe_tiff_exif)
    d = probe_tiff_exif(_tiff_le(640, 480, 6, "2024:01:02 03:04:05"))
    assert d == {"byte_order": "little", "width": 640, "height": 480,
                 "orientation": 6,
                 "datetime_original": "2024:01:02 03:04:05"}


def test_exif_probe_big_endian_inline_shorts():
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        probe_tiff_exif)
    hdr = b"MM" + struct.pack(">HI", 42, 8)
    e = struct.pack(">HHI", 0x0100, 3, 1) + struct.pack(">HH", 320, 0)
    e += struct.pack(">HHI", 0x0101, 3, 1) + struct.pack(">HH", 240, 0)
    e += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 1, 0)
    d = probe_tiff_exif(hdr + struct.pack(">H", 3) + e
                        + struct.pack(">I", 0))
    assert d["byte_order"] == "big"
    assert (d["width"], d["height"], d["orientation"]) == (320, 240, 1)


def test_exif_probe_jpeg_app1_carriage_and_errors():
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        probe_tiff_exif)
    tiff = _tiff_le(64, 32, 3)
    app1 = b"Exif\x00\x00" + tiff
    jpeg = (b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2)
            + app1 + b"\xff\xd9")
    d = probe_tiff_exif(jpeg)
    assert (d["width"], d["height"], d["orientation"]) == (64, 32, 3)
    for bad in (b"XX" + tiff[2:],      # bad byte-order mark
                tiff[:20],             # truncated IFD
                b"\xff\xd8\xff\xd9"):  # JPEG without APP1
        with pytest.raises(ValueError):
            probe_tiff_exif(bad)


# --- MP3 frame walk ----------------------------------------------------------

def test_mp3_frame_walk_and_taxonomy():
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        _MP3_BITRATES, _MP3_RATES, parse_mp3_frames)

    def frame(bidx, ridx, pad):
        hdr = bytes([0xFF, 0xFB,
                     (bidx << 4) | (ridx << 2) | (pad << 1), 0x00])
        flen = 144 * _MP3_BITRATES[bidx] * 1000 // _MP3_RATES[ridx] + pad
        return hdr + b"\x00" * (flen - 4)

    stream = frame(9, 0, 0) + frame(9, 0, 1) + frame(14, 0, 0)
    d = parse_mp3_frames(stream)
    assert d["n_frames"] == 3
    assert d["bitrate_kbps"] == 128       # first frame's index 9
    assert d["sample_rate"] == 44100
    assert d["duration_ms"] == 3 * 1152 * 1000 // 44100

    # ID3v2 prefix skipped by its syncsafe length
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"x" * 20
    assert parse_mp3_frames(id3 + stream)["n_frames"] == 3

    free_fmt = bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 100
    reserved = bytes([0xFF, 0xFB, (9 << 4) | (3 << 2), 0x00]) + b"\x00" * 100
    for bad in (stream[:-10],             # last frame overruns
                b"\x00" * 8,              # no sync word
                free_fmt,                 # free-format bitrate index
                reserved,                 # reserved rate index
                frame(9, 0, 0) + frame(9, 1, 0)):  # rate change mid-stream
        with pytest.raises(ValueError):
            parse_mp3_frames(bad)


def test_media_batch_dispatches_mp3():
    import pandas as pd
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        _MP3_BITRATES, _MP3_RATES, decode_media_batch)

    def fr(bidx, ridx, pad, mode=3):
        hdr = bytes([0xFF, 0xFB,
                     (bidx << 4) | (ridx << 2) | (pad << 1), mode << 6])
        flen = 144 * _MP3_BITRATES[bidx] * 1000 // _MP3_RATES[ridx] + pad
        return hdr + b"\x00" * (flen - 4)

    mono = fr(9, 0, 0) + fr(9, 0, 1)
    stereo = fr(5, 1, 0, mode=0)
    id3_only = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 4]) + b"tagx"
    out = decode_media_batch(pd.Series([mono, stereo, id3_only]))
    assert out.iloc[0]["mime_detected"] == "audio/mpeg"
    assert out.iloc[0]["channels"] == 1
    assert out.iloc[0]["sample_rate"] == 44100
    assert out.iloc[0]["duration_ms"] == 2 * 1152 * 1000 // 44100
    assert out.iloc[1]["channels"] == 2
    assert out.iloc[1]["sample_rate"] == 48000
    assert out.iloc[2]["mime_detected"] == "corrupt/mpeg"


def _mp3_frame_with_side(bidx=2, ridx=1, mdb=0, p23=(100, 200),
                         bigv=(50, 60)):
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        _MP3_BITRATES, _MP3_RATES)
    br, sr = _MP3_BITRATES[bidx], _MP3_RATES[ridx]
    flen = 144 * br * 1000 // sr
    hdr = bytes([0xFF, 0xFB, (bidx << 4) | (ridx << 2), 0xC0])
    bits = [(mdb, 9), (0, 5), (0, 4)]
    for g in range(2):
        bits += [(p23[g], 12), (bigv[g], 9), (0, 38)]
    acc, nb = 0, 0
    for v, w in bits:
        acc = (acc << w) | v
        nb += w
    side = acc.to_bytes(nb // 8, "big")
    return hdr + side + b"\x00" * (flen - 4 - len(side)), flen - 21


def test_mp3_sideinfo_reservoir_invariants():
    import pytest
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        parse_mp3_sideinfo)
    f0, main_len = _mp3_frame_with_side(mdb=0)
    f1, _ = _mp3_frame_with_side(mdb=min(511, main_len))
    d = parse_mp3_sideinfo(f0 + f1)
    assert d["n_frames"] == 2
    assert d["max_main_data_begin"] == min(511, main_len)
    assert d["sum_part23_bits"] == 2 * (100 + 200)
    assert d["max_big_values"] == 60

    # frame 0 claiming reservoir bytes that don't exist yet: corrupt
    bad0, _ = _mp3_frame_with_side(mdb=1)
    with pytest.raises(ValueError, match="exceeds reservoir"):
        parse_mp3_sideinfo(bad0)

    # big_values over the 288 spectral-pair cap: corrupt
    badbv, _ = _mp3_frame_with_side(bigv=(289, 0))
    with pytest.raises(ValueError, match="big_values"):
        parse_mp3_sideinfo(badbv)

    # part2_3_length addressing more main data than reachable: corrupt
    badp, ml = _mp3_frame_with_side(p23=(4095, 4095))
    if 2 * 4095 > 8 * ml:
        with pytest.raises(ValueError, match="reservoir underflow"):
            parse_mp3_sideinfo(badp)


# --- sample tables (stts/stsc/stsz/stco) ------------------------------------

def test_sample_table_roundtrip_and_offsets():
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        build_mp4_sample_table, parse_mp4_samples)
    samples = [bytes([(i * 37) % 256]) * (5 + i % 3) for i in range(11)]
    mp4 = build_mp4_sample_table(samples, stts=[(4, 100), (7, 200)],
                                 chunk_sizes=[3, 3, 3, 2])
    r = parse_mp4_samples(mp4)
    assert r["n_samples"] == 11 and r["n_chunks"] == 4
    assert r["duration"] == 4 * 100 + 7 * 200
    assert [s["dts"] for s in r["samples"]][:6] == [0, 100, 200, 300,
                                                    400, 600]
    for i, s in enumerate(r["samples"]):
        assert s["size"] == len(samples[i])
        assert s["first_byte"] == samples[i][0]


def test_sample_table_validation():
    import pytest
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        build_mp4_sample_table, parse_mp4_samples)
    samples = [b"ab"] * 4
    with pytest.raises(ValueError):
        build_mp4_sample_table(samples, stts=[(3, 10)], chunk_sizes=[4])
    with pytest.raises(ValueError):
        build_mp4_sample_table(samples, stts=[(4, 10)], chunk_sizes=[3])
    mp4 = bytearray(build_mp4_sample_table(samples, stts=[(4, 10)],
                                           chunk_sizes=[2, 2]))
    # corrupt the stco chunk offset so a sample leaves the file
    i = bytes(mp4).rfind(b"stco")
    mp4[i + 12:i + 16] = (len(mp4) - 1).to_bytes(4, "big")
    with pytest.raises(ValueError):
        parse_mp4_samples(bytes(mp4))


def test_sample_table_stsc_run_expansion():
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        build_mp4_sample_table, parse_mp4_samples)
    # 7 chunks: 2,2,2,1,1,3,3 -> stsc compresses to 4 runs
    sizes = [2, 2, 2, 1, 1, 3, 3]
    samples = [bytes([i]) for i in range(sum(sizes))]
    r = parse_mp4_samples(build_mp4_sample_table(
        samples, stts=[(sum(sizes), 40)], chunk_sizes=sizes))
    assert r["n_chunks"] == 7
    assert [s["first_byte"] for s in r["samples"]] == list(
        range(sum(sizes)))
