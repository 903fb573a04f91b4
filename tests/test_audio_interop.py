"""Audio codecs cross-checked against INDEPENDENT stdlib
implementations (round 10). The zstd lesson applied to audio: a
roundtrip test whose encoder and decoder share the tables can't see a
wrong table — G.711's A-law sign convention was exactly such a bug
(sign bit 1 means POSITIVE; the expansion had it inverted, the SQL
oracle faithfully replicated the inversion, and every roundtrip was
green). `audioop`/`wave` are independent C implementations, so these
tests pin the conventions from outside. audioop is deprecated (removed
in 3.13) — the tests skip gracefully when it disappears; the exhaustive
256-value expectations stay pinned in source via the checksums below.
"""

from __future__ import annotations

import struct
import warnings

import pytest

try:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop
except ImportError:                                # Python >= 3.13
    audioop = None

from precios_nexo_sperant_etl_spark.operators.multimodal import (
    _alaw_expand, _ulaw_expand, decode_wav, decode_wav_ima,
    encode_wav_ima, wav_samples)


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_g711_expansion_matches_audioop_exhaustively():
    import numpy as np
    arr = np.arange(256, dtype=np.int64)
    v_u, v_a = _ulaw_expand(arr), _alaw_expand(arr)
    for b in range(256):
        ref_u = int.from_bytes(audioop.ulaw2lin(bytes([b]), 2),
                               "little", signed=True)
        ref_a = int.from_bytes(audioop.alaw2lin(bytes([b]), 2),
                               "little", signed=True)
        assert _ulaw_expand(b) == ref_u == int(v_u[b]), f"ulaw byte {b}"
        assert _alaw_expand(b) == ref_a == int(v_a[b]), f"alaw byte {b}"


def test_g711_table_checksums_pinned():
    """audioop-independent pins (survive its 3.13 removal): exact sums
    and extremes of both 256-entry expansion tables."""
    u = [_ulaw_expand(b) for b in range(256)]
    a = [_alaw_expand(b) for b in range(256)]
    assert (min(u), max(u), sum(u)) == (-32124, 32124, 0)
    assert (min(a), max(a), sum(a)) == (-32256, 32256, 0)
    assert sum(abs(x) for x in u) == 1532928
    assert sum(abs(x) for x in a) == 1564672
    # the sign convention itself (audioop-verified): in BOTH laws the
    # transmitted byte's bit 7 SET decodes positive — mu-law because
    # the whole byte is complemented on the wire, A-law because the
    # sign bit itself means positive and XOR 0x55 leaves bit 7 alone
    assert _alaw_expand(0x80) > 0 > _alaw_expand(0x00)
    assert _ulaw_expand(0x80) > 0 > _ulaw_expand(0x00)


def test_wav_container_interop_with_stdlib_wave(tmp_path):
    """A PCM WAV written by the stdlib `wave` module parses through
    our chunk walker with identical geometry and samples."""
    import wave

    frames = [(i * 37 % 4001) - 2000 for i in range(300)]
    stereo = [v for f in frames for v in (f, -f)]
    p = tmp_path / "w.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack(f"<{len(stereo)}h", *stereo))
    blob = p.read_bytes()
    d = decode_wav(blob)
    assert d["channels"] == 2
    assert d["sample_rate"] == 16000
    assert d["n_frames"] == 300
    got = wav_samples(blob)
    assert got.shape == (300, 2)
    assert [int(v) for row in got for v in row] == stereo


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_ima_adpcm_core_matches_audioop():
    """Per-block IMA transform vs audioop.adpcm2lin fed the same seed
    state. audioop consumes nibbles HIGH-first per byte while WAV IMA
    packs LOW-first, so the reference feed repacks; the seed sample
    itself is ours (audioop emits only the post-seed samples)."""
    import random
    rng = random.Random(11)
    for trial in range(20):
        pred = rng.randrange(-30000, 30000)
        idx = rng.randrange(0, 89)
        nibbles = [rng.randrange(16) for _ in range(16)]
        ours = decode_wav_ima(
            encode_wav_ima([(pred, idx, nibbles)]))["samples"]
        assert ours[0] == pred
        repacked = bytes(((nibbles[i] << 4) | nibbles[i + 1])
                         for i in range(0, len(nibbles), 2))
        lin, _ = audioop.adpcm2lin(repacked, 2, (pred, idx))
        ref = list(struct.unpack(f"<{len(nibbles)}h", lin))
        assert ours[1:] == ref, f"trial {trial}"


def test_g711_wav_framing_recognized_by_javax_sound(spark):
    """The format-6/7 RIFF framing the g711 fixtures emit is read by
    javax.sound.sampled as genuine ALAW/ULAW audio with the right
    geometry (the container half; the expansion tables are pinned by
    the audioop tests above)."""
    jvm = spark.sparkContext._jvm
    payload = bytes((13 * i + 7) % 256 for i in range(64))

    def g711_wav(fmt_tag):
        fmt = struct.pack("<HHIIHH", fmt_tag, 1, 8000, 8000, 1, 8)
        chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(payload)) + payload)
        return (b"RIFF" + struct.pack("<I", 4 + len(chunks))
                + b"WAVE" + chunks)

    for tag, enc in ((7, "ULAW"), (6, "ALAW")):
        blob = g711_wav(tag)
        d = decode_wav(blob)
        assert d["audio_format"] == tag and d["n_frames"] == 64
        ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(blob)))
        f = ais.getFormat()
        assert str(f.getEncoding()) == enc
        assert int(f.getSampleRate()) == 8000
        assert int(ais.getFrameLength()) == 64
