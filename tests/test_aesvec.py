"""Batch (NumPy) AES-GCM must be bit-equal to the scalar from-scratch
module (which is itself pinned against javax.crypto and the NIST
vectors in tests/test_aesgcm.py) — every lane, every key size, empty
payloads, and the authentication-refusal contract."""

import pytest

from precios_nexo_sperant_etl_spark.functions.aesgcm import (
    AesError, gcm_decrypt, gcm_encrypt)
from precios_nexo_sperant_etl_spark.functions.aesvec import (
    expand_keys_batch, gcm_encrypt_batch, gcm_open_batch,
    gcm_verify_batch)
from precios_nexo_sperant_etl_spark.functions.aesgcm import _expand_key


def _lanes(key_len: int, n: int = 40):
    keys, ivs, pts, aads = [], [], [], []
    for i in range(n):
        keys.append(bytes((i + j) % 256 for j in range(key_len)))
        ivs.append(bytes((i * 3 + j) % 256 for j in range(12)))
        pts.append(bytes((i * 7 + j) % 256 for j in range(i * 9 % 257)))
        aads.append(f"doc:{i}".encode() if i % 3 else b"")
    return keys, ivs, pts, aads


@pytest.mark.parametrize("key_len", [16, 24, 32])
def test_expand_matches_scalar(key_len):
    keys, _, _, _ = _lanes(key_len, 8)
    batch = expand_keys_batch(keys)
    for i, k in enumerate(keys):
        flat = [b for rk in _expand_key(k) for b in rk]
        assert batch[i].reshape(-1).tolist() == flat


@pytest.mark.parametrize("key_len", [16, 24, 32])
def test_encrypt_open_matches_scalar(key_len):
    keys, ivs, pts, aads = _lanes(key_len)
    got = gcm_encrypt_batch(keys, ivs, pts, aads)
    for i in range(len(keys)):
        ct, tag = gcm_encrypt(keys[i], ivs[i], pts[i], aads[i])
        assert got[i] == (ct, tag), i
    cts = [g[0] for g in got]
    tags = [g[1] for g in got]
    back = gcm_open_batch(keys, ivs, cts, tags, aads)
    for i in range(len(keys)):
        assert back[i] == pts[i]
        assert gcm_decrypt(keys[i], ivs[i], cts[i], tags[i],
                           aads[i]) == pts[i]


def test_refusal_contract():
    keys, ivs, pts, aads = _lanes(16, 12)
    sealed = gcm_encrypt_batch(keys, ivs, pts, aads)
    cts = [ct if not ct else ct[:-1] + bytes([ct[-1] ^ 1])
           for ct, _ in sealed]
    tags = [tag for _, tag in sealed]
    oks = gcm_verify_batch(keys, ivs, cts, tags, aads)
    back = gcm_open_batch(keys, ivs, cts, tags, aads)
    for i, (ct, pt) in enumerate(zip(cts, pts)):
        if pt:  # tampered lane: refused, plaintext never exposed
            assert not oks[i] and back[i] is None
            with pytest.raises(AesError):
                gcm_decrypt(keys[i], ivs[i], ct, tags[i], aads[i])
        else:   # empty ct could not be tampered: still authentic
            assert oks[i] and back[i] == b""


def test_batch_rejects_non96_iv():
    with pytest.raises(ValueError):
        gcm_encrypt_batch([b"k" * 16], [b"iv" * 4], [b"x"], [b""])


def test_batch_lane_length_mismatch_raises():
    from precios_nexo_sperant_etl_spark.functions.aesvec import (
        gcm_encrypt_batch, gcm_open_batch, gcm_verify_batch)
    import pytest
    keys = [b"k" * 16, b"q" * 16]
    ivs = [b"i" * 12]
    with pytest.raises(ValueError, match="ivs has 1 entries for 2 keys"):
        gcm_encrypt_batch(keys, ivs, [b"a", b"b"], [b"", b""])
    with pytest.raises(ValueError, match="tags has"):
        gcm_verify_batch(keys, ivs * 2, [b"a", b"b"], [b"t" * 16], [b"", b""])
    with pytest.raises(ValueError, match="aads has"):
        gcm_open_batch(keys, ivs * 2, [b"a", b"b"], [b"t" * 16] * 2, [b""])
