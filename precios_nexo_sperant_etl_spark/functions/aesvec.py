"""NumPy-vectorized batch twin of ``functions.aesgcm`` (AES + GCM).

Same FIPS-197 / SP 800-38D algorithms; the per-block round loop stays
sequential but every round step is one vector operation across all
keystream blocks of the batch (guide §4.2). All lookup tables are
DERIVED here from the aesgcm module's own derived S-box and GF(2^8)
multiply — nothing transcribed. GHASH stays the scalar from-scratch
``_ghash`` per lane (it is not the hot term; the CTR keystream is).

Semantics pinned against the scalar module in
``tests/test_aesvec.py``: identical ciphertext/tag on every lane,
authentication REQUIRED on open (a lane with a bad tag yields None and
its plaintext is never exposed), and verification never runs the CTR
pass — exactly the scalar ``gcm_decrypt`` behavior.

Batch contract: every lane shares one key size and 96-bit IVs (the
envelope-encryption shape). Anything else belongs on the scalar path.
"""

from __future__ import annotations

import hmac as _hmac
import struct

import numpy as np

from .aesgcm import _RCON, _SBOX, _gf_mul8, _ghash

_SBOX_NP = np.array(_SBOX, dtype=np.uint8)
_M2 = np.array([_gf_mul8(x, 2) for x in range(256)], dtype=np.uint8)
_M3 = np.array([_gf_mul8(x, 3) for x in range(256)], dtype=np.uint8)
#: ShiftRows on the column-major flat layout (same index formula as
#: aesgcm.encrypt_block).
_SHIFT = np.array([(i + 4 * (i % 4)) % 16 for i in range(16)],
                  dtype=np.int64)


def expand_keys_batch(keys: list[bytes]) -> np.ndarray:
    """(n, nr+1, 16) uint8 round keys; all lanes share one key size."""
    n = len(keys)
    nk = len(keys[0]) // 4
    if nk not in (4, 6, 8) or any(len(k) != 4 * nk for k in keys):
        raise ValueError("batch AES keys must share one 128/192/256 size")
    nr = nk + 6
    kmat = np.frombuffer(b"".join(keys), dtype=np.uint8) \
        .reshape(n, 4 * nk)
    words = [kmat[:, 4 * i:4 * i + 4].copy() for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = _SBOX_NP[np.roll(t, -1, axis=1)]
            t = t.copy()
            t[:, 0] ^= np.uint8(_RCON[i // nk - 1])
        elif nk == 8 and i % nk == 4:
            t = _SBOX_NP[t]
        words.append(words[i - nk] ^ t)
    return np.stack(words, axis=1).reshape(n, nr + 1, 16)


def encrypt_blocks(rk_rows: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """AES-encrypt (R, 16) uint8 blocks, each with its own (nr+1, 16)
    round-key row — fully vectorized over R."""
    nr = rk_rows.shape[1] - 1
    s = blocks ^ rk_rows[:, 0, :]
    for rnd in range(1, nr + 1):
        s = _SBOX_NP[s]
        s = s[:, _SHIFT]
        if rnd != nr:
            cols = s.reshape(-1, 4, 4)
            a, b, c, d = (cols[:, :, 0], cols[:, :, 1],
                          cols[:, :, 2], cols[:, :, 3])
            s = np.stack([_M2[a] ^ _M3[b] ^ c ^ d,
                          a ^ _M2[b] ^ _M3[c] ^ d,
                          a ^ b ^ _M2[c] ^ _M3[d],
                          _M3[a] ^ b ^ c ^ _M2[d]],
                         axis=2).reshape(-1, 16)
        s = s ^ rk_rows[:, rnd, :]
    return s


def _keystream_blocks(rks: np.ndarray, ivs: list[bytes],
                      nblocks: np.ndarray) -> tuple[np.ndarray,
                                                    np.ndarray,
                                                    np.ndarray]:
    """Per-lane H (as int128-ready bytes), E(J0) tag masks, and the
    flat CTR keystream rows (one row per 16-byte data block, lane-major
    in order)."""
    n = len(ivs)
    ivmat = np.frombuffer(b"".join(ivs), dtype=np.uint8).reshape(n, 12)
    h = encrypt_blocks(rks, np.zeros((n, 16), dtype=np.uint8))
    j0 = np.concatenate(
        [ivmat, np.tile(np.array([0, 0, 0, 1], dtype=np.uint8), (n, 1))],
        axis=1)
    ej0 = encrypt_blocks(rks, j0)
    total = int(nblocks.sum())
    lane = np.repeat(np.arange(n), nblocks)
    # within-lane block index k -> counter value 2 + k (inc32 before use)
    starts = np.concatenate([[0], np.cumsum(nblocks)[:-1]])
    k = np.arange(total) - starts[lane]
    ctr32 = (k + 2).astype(np.uint32)  # wraps mod 2^32 like inc32
    ctr_rows = np.empty((total, 16), dtype=np.uint8)
    ctr_rows[:, :12] = ivmat[lane]
    ctr_rows[:, 12:] = ctr32.astype(">u4").view(np.uint8).reshape(-1, 4)
    ks = encrypt_blocks(rks[lane], ctr_rows)
    return h, ej0, ks


def _lens_block(aad: bytes, ct_len: int) -> bytes:
    return struct.pack(">QQ", len(aad) * 8, ct_len * 8)


def _pad16(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 16)


def _xor_payloads(payloads: list[bytes], ks: np.ndarray,
                  nblocks: np.ndarray) -> list[bytes]:
    total_rows = int(nblocks.sum())
    flat = np.zeros(total_rows * 16, dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(nblocks * 16)[:-1]])
    for i, p in enumerate(payloads):
        if p:
            flat[offs[i]:offs[i] + len(p)] = np.frombuffer(p, np.uint8)
    out = flat ^ ks.reshape(-1)
    return [out[offs[i]:offs[i] + len(p)].tobytes()
            for i, p in enumerate(payloads)]



def _check_lanes(keys, **named):
    """Public batch entry points take parallel per-lane lists; a length
    mismatch would otherwise truncate silently (zip) or surface as an
    opaque numpy shape error (np.fromiter count=len(keys))."""
    for name, vals in named.items():
        if len(vals) != len(keys):
            raise ValueError(
                f"aesvec batch: {name} has {len(vals)} entries for "
                f"{len(keys)} keys")


def gcm_encrypt_batch(keys: list[bytes], ivs: list[bytes],
                      plaintexts: list[bytes], aads: list[bytes]
                      ) -> list[tuple[bytes, bytes]]:
    """Batch twin of ``gcm_encrypt`` for 96-bit IV lanes."""
    _check_lanes(keys, ivs=ivs, plaintexts=plaintexts, aads=aads)
    if any(len(iv) != 12 for iv in ivs):
        raise ValueError("batch GCM path requires 96-bit IVs")
    rks = expand_keys_batch(keys)
    nblocks = np.fromiter(((len(p) + 15) // 16 for p in plaintexts),
                          dtype=np.int64, count=len(keys))
    h, ej0, ks = _keystream_blocks(rks, ivs, nblocks)
    cts = _xor_payloads(plaintexts, ks, nblocks)
    out = []
    for i, ct in enumerate(cts):
        hi = int.from_bytes(h[i].tobytes(), "big")
        s = _ghash(hi, _pad16(aads[i]), _pad16(ct),
                   _lens_block(aads[i], len(ct)))
        tag = bytes(a ^ b for a, b in zip(s.to_bytes(16, "big"),
                                          ej0[i].tobytes()))
        out.append((ct, tag))
    return out


def gcm_verify_batch(keys: list[bytes], ivs: list[bytes],
                     ciphertexts: list[bytes], tags: list[bytes],
                     aads: list[bytes]) -> list[bool]:
    """Tag check only — like scalar ``gcm_decrypt`` refusing before any
    CTR work. One AES block per lane plus GHASH."""
    _check_lanes(keys, ivs=ivs, ciphertexts=ciphertexts, tags=tags,
                 aads=aads)
    if any(len(iv) != 12 for iv in ivs):
        raise ValueError("batch GCM path requires 96-bit IVs")
    rks = expand_keys_batch(keys)
    zero = np.zeros(len(keys), dtype=np.int64)
    h, ej0, _ = _keystream_blocks(rks, ivs, zero)
    oks = []
    for i, ct in enumerate(ciphertexts):
        hi = int.from_bytes(h[i].tobytes(), "big")
        s = _ghash(hi, _pad16(aads[i]), _pad16(ct),
                   _lens_block(aads[i], len(ct)))
        want = bytes(a ^ b for a, b in zip(s.to_bytes(16, "big"),
                                           ej0[i].tobytes()))
        oks.append(_hmac.compare_digest(want, tags[i]))
    return oks


def gcm_open_batch(keys: list[bytes], ivs: list[bytes],
                   ciphertexts: list[bytes], tags: list[bytes],
                   aads: list[bytes]) -> list[bytes | None]:
    """Batch twin of ``gcm_decrypt``: verify THEN decrypt; a failed
    lane yields None and its plaintext is never produced."""
    _check_lanes(keys, ivs=ivs, ciphertexts=ciphertexts, tags=tags,
                 aads=aads)
    oks = gcm_verify_batch(keys, ivs, ciphertexts, tags, aads)
    idx = [i for i, ok in enumerate(oks) if ok]
    if not idx:
        return [None] * len(keys)
    rks = expand_keys_batch([keys[i] for i in idx])
    sub_ct = [ciphertexts[i] for i in idx]
    nblocks = np.fromiter(((len(c) + 15) // 16 for c in sub_ct),
                          dtype=np.int64, count=len(idx))
    _, _, ks = _keystream_blocks(rks, [ivs[i] for i in idx], nblocks)
    pts = _xor_payloads(sub_ct, ks, nblocks)
    out: list[bytes | None] = [None] * len(keys)
    for j, i in enumerate(idx):
        out[i] = pts[j]
    return out
