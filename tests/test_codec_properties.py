"""Property-based checks for the round-7 byte-level codecs (hypothesis,
no Spark session): arbitrary inputs, not hand-picked fixtures.

- JPEG: any image roundtrips within ±1 at quant=1 under any restart
  interval; flat images roundtrip bit-exactly at any size.
- WebDataset tar: any set of (name, payload) members roundtrips
  byte-exactly through build_shard → parse_tar_members, and always
  agrees with stdlib tarfile's read of the same bytes.
- MP3: any frame sequence built from valid table indices walks back to
  the exact frame count/duration.
- gzip: wrap/unwrap identity over arbitrary byte strings.
"""

from __future__ import annotations

import gzip
import io
import tarfile

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.jpegcodec import (
    decode_baseline, encode_baseline_gray)
from precios_nexo_sperant_etl_spark.operators.multimodal import (
    _MP3_BITRATES, _MP3_RATES, decode_gzip, parse_mp3_frames)
from precios_nexo_sperant_etl_spark.operators.webdataset import (
    build_shard, group_samples, parse_tar_members)

_SETTINGS = dict(max_examples=20, deadline=None)


@settings(**_SETTINGS)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 4),
       st.integers(0, 2 ** 32 - 1))
def test_jpeg_random_roundtrip_within_one(bh, bw, restart, seed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(bh * 8, bw * 8), dtype=np.uint8)
    j = encode_baseline_gray(px, restart_interval=restart)
    d = decode_baseline(j)
    assert d["pixels"].shape == px.shape
    assert np.abs(d["pixels"].astype(int) - px.astype(int)).max() <= 1


@settings(**_SETTINGS)
@given(st.integers(0, 255), st.integers(1, 6), st.integers(1, 6))
def test_jpeg_flat_roundtrip_bit_exact(v, bh, bw):
    px = np.full((bh * 8, bw * 8), v, dtype=np.uint8)
    assert np.array_equal(decode_baseline(encode_baseline_gray(px))["pixels"],
                          px)


_member_names = st.lists(
    st.from_regex(r"[a-z0-9]{1,12}\.[a-z0-9.]{1,8}", fullmatch=True),
    min_size=1, max_size=12, unique=True)


@settings(**_SETTINGS)
@given(_member_names, st.data())
def test_tar_roundtrip_and_stdlib_agreement(names, data):
    parts = [(n, data.draw(st.binary(max_size=2000), label=n))
             for n in names]
    shard = build_shard(parts)
    ours = {m["name"]: m["data"] for m in parse_tar_members(shard)}
    assert ours == dict(parts)
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        theirs = {ti.name: tf.extractfile(ti).read()
                  for ti in tf.getmembers()}
    assert ours == theirs
    # grouping never loses a member when (key, ext) pairs are unique
    keyed = group_samples(parse_tar_members(shard))
    assert sum(len(v) for v in keyed.values()) == len(parts)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(1, 14), st.booleans()),
                min_size=1, max_size=8),
       st.integers(0, 2))
def test_mp3_frame_walk_exact(frames, ridx):
    rate = _MP3_RATES[ridx]
    chunks = []
    for bidx, pad in frames:
        hdr = bytes([0xFF, 0xFB,
                     (bidx << 4) | (ridx << 2) | (int(pad) << 1), 0xC0])
        flen = 144 * _MP3_BITRATES[bidx] * 1000 // rate + int(pad)
        chunks.append(hdr + b"\x00" * (flen - 4))
    d = parse_mp3_frames(b"".join(chunks))
    assert d["n_frames"] == len(frames)
    assert d["bitrate_kbps"] == _MP3_BITRATES[frames[0][0]]
    assert d["sample_rate"] == rate and d["channels"] == 1
    assert d["duration_ms"] == len(frames) * 1152 * 1000 // rate


@settings(**_SETTINGS)
@given(st.binary(max_size=5000))
def test_gzip_wrap_unwrap_identity(raw):
    assert decode_gzip(gzip.compress(raw)) == raw


def test_html_to_text_strip_order_and_entities(spark):
    from pyspark.sql import functions as F
    from precios_nexo_sperant_etl_spark.operators.text import html_to_text
    html = ('<html><head><style>p{x:1}</style>'
            '<script>var s="<b>fake</b>";</script></head>'
            '<body><p>Tom &amp; Jerry &lt;3</p>'
            '<!-- gone --><p>two  \n spaces</p></body></html>')
    out = (spark.range(1)
           .select(html_to_text(F.lit(html)).alias("t"))
           .collect()[0]["t"])
    assert out == 'Tom & Jerry <3 two spaces'
    # script body (including its fake tag) vanished entirely
    assert "fake" not in out and "x:1" not in out


def _cdc_chunks(text, w=8, mod=64):
    """Pure-python twin of the cdc_chunk_dedup cut rule (md5 12-hex
    window hash mod 64) — the oracle pins the Spark side to exactly
    this; here it demonstrates the insertion-stability property."""
    import hashlib
    n = len(text)
    cuts = [i for i in range(w, n + 1)
            if int(hashlib.md5(text[i - w:i].encode()).hexdigest()[:12],
                   16) % mod == 0]
    bounds = [0] + cuts + [n]
    return {text[a:b] for a, b in zip(bounds, bounds[1:]) if b > a}


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.integers(0, 400))
def test_cdc_chunks_are_insertion_stable(seed, pos):
    """Inserting one character invalidates only the chunks around the
    edit: most chunk hashes survive — the property fixed-size chunking
    lacks (one insertion would re-key every later chunk)."""
    rng = np.random.RandomState(seed)
    text = "".join(chr(97 + c) for c in rng.randint(0, 26, size=800))
    pos = pos % len(text)
    mutated = text[:pos] + "!" + text[pos:]
    a, b = _cdc_chunks(text), _cdc_chunks(mutated)
    # chunks are ~64 chars, so ~12 chunks total; the edit may destroy
    # the one or two chunks containing it, never the far-away ones
    assert len(a & b) >= len(a) - 3


# --- palette PNG (color type 3) ---------------------------------------------

@settings(**_SETTINGS)
@given(st.integers(0, 2 ** 31 - 1), st.booleans(),
       st.sampled_from([2, 5, 16, 256]))
def test_png_palette_roundtrip_property(seed, interlace, ncolors):
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        decode_png, encode_png_palette)
    rng = np.random.RandomState(seed % 2 ** 31)
    idx = rng.randint(0, ncolors, size=(16, 16)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(ncolors, 3)).astype(np.uint8)
    r = decode_png(encode_png_palette(idx, pal, interlace=interlace))
    assert r["palette_size"] == ncolors
    assert r["bits_per_pixel"] == 8
    assert np.array_equal(r["rgb"], pal[idx])


def test_png_palette_rejects_bad_index_and_missing_plte():
    import pytest
    from precios_nexo_sperant_etl_spark.operators.multimodal import (
        decode_png, encode_png_palette)
    idx = np.full((4, 4), 3, dtype=np.uint8)
    pal = np.zeros((3, 3), dtype=np.uint8)       # only indices 0..2
    with pytest.raises(ValueError):
        encode_png_palette(idx, pal)
    # strip the PLTE chunk -> decoder must refuse, not misread
    png = bytearray(encode_png_palette(np.zeros((4, 4), dtype=np.uint8),
                                       np.zeros((2, 3), dtype=np.uint8)))
    i = bytes(png).index(b"PLTE") - 4
    import struct
    (ln,) = struct.unpack_from(">I", png, i)
    del png[i:i + 12 + ln]
    with pytest.raises(ValueError):
        decode_png(bytes(png))
