"""NumPy-vectorized batch twins of the from-scratch digest family.

Same algorithms as ``functions.hashes`` (MD5 / SHA-256, constants
derived from the defining formulas) and ``operators.gitpack`` (SHA-1):
the compression loops stay round-sequential but every round step is a
vector operation across all lanes of the batch (guide §4.2). Lanes may
have different lengths: each message is padded per-spec, the batch is
zero-extended to the max block count, and a lane's state only advances
while its own blocks last.

Bit-equality with the scalar implementations (and hashlib) is pinned
in ``tests/test_hashvec.py``.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_U32 = np.uint32

# --- shared padding ---------------------------------------------------------


def _pad_blocks(msgs: list[bytes], little: bool) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """(n, max_blocks, 16) uint32 word cube + per-lane block counts."""
    n = len(msgs)
    padded = []
    for m in msgs:
        p = m + b"\x80" + b"\x00" * ((56 - (len(m) + 1) % 64) % 64)
        p += struct.pack("<Q" if little else ">Q", len(m) * 8)
        padded.append(p)
    nblk = np.fromiter((len(p) // 64 for p in padded), dtype=np.int64,
                       count=n)
    mx = int(nblk.max()) if n else 0
    raw = np.zeros((n, mx * 64), dtype=np.uint8)
    for i, p in enumerate(padded):
        raw[i, :len(p)] = np.frombuffer(p, dtype=np.uint8)
    # zero-copy word view; one byteswap copy only for the big-endian
    # digests (the little-endian MD5 view is already native here)
    cube = raw.view("<u4" if little else ">u4").astype(np.uint32,
                                                       copy=not little)
    return cube.reshape(n, mx, 16), nblk


#: Lanes are dispatched in power-of-two block-count groups: one slow
#: lane (a multi-hundred-block tree object among 6-block blobs) would
#: otherwise stretch the masked block loop — and the word cube — to
#: its own width for EVERY lane. Groups below this lane count fall
#: back to the scalar implementation (vector ops on a 2-lane array
#: cost more than the plain-int rounds).
_MIN_VECTOR_LANES = 8


def _grouped(msgs: list[bytes], vector_fn, scalar_fn) -> list[bytes]:
    n = len(msgs)
    if n == 0:
        return []
    groups: dict[int, list[int]] = {}
    for i, m in enumerate(msgs):
        nblk = (len(m) + 9 + 63) // 64
        groups.setdefault(nblk.bit_length(), []).append(i)
    out: list[bytes | None] = [None] * n
    for idx in groups.values():
        if len(idx) < _MIN_VECTOR_LANES:
            for i in idx:
                out[i] = scalar_fn(msgs[i])
        else:
            for i, d in zip(idx, vector_fn([msgs[i] for i in idx])):
                out[i] = d
    return out  # type: ignore[return-value]


def _rotl32(x: np.ndarray, s: int) -> np.ndarray:
    return (x << _U32(s)) | (x >> _U32(32 - s))


def _rotr32(x: np.ndarray, s: int) -> np.ndarray:
    return (x >> _U32(s)) | (x << _U32(32 - s))


# --- MD5 (RFC 1321) ---------------------------------------------------------

_MD5_K = np.array([int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF
                   for i in range(64)], dtype=np.uint32)
_MD5_S = ([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
          + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4)


def md5_batch(msgs: list[bytes]) -> list[bytes]:
    from .hashes import md5 as _md5_scalar
    return _grouped(msgs, _md5_batch_lanes, _md5_scalar)


def _md5_batch_lanes(msgs: list[bytes]) -> list[bytes]:
    cube, nblk = _pad_blocks(msgs, little=True)
    n = len(msgs)
    h = np.empty((n, 4), dtype=np.uint32)
    h[:, 0], h[:, 1] = _U32(0x67452301), _U32(0xEFCDAB89)
    h[:, 2], h[:, 3] = _U32(0x98BADCFE), _U32(0x10325476)
    for blk in range(cube.shape[1]):
        active = nblk > blk
        m = cube[:, blk, :]
        a, b, c, d = h[:, 0].copy(), h[:, 1].copy(), h[:, 2].copy(), \
            h[:, 3].copy()
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
                g = i
            elif i < 32:
                f = (d & b) | (~d & c)
                g = (5 * i + 1) % 16
            elif i < 48:
                f = b ^ c ^ d
                g = (3 * i + 5) % 16
            else:
                f = c ^ (b | ~d)
                g = (7 * i) % 16
            f = f + a + _MD5_K[i] + m[:, g]
            a, d, c = d, c, b
            b = b + _rotl32(f, _MD5_S[i])
        upd = np.stack([h[:, 0] + a, h[:, 1] + b, h[:, 2] + c,
                        h[:, 3] + d], axis=1)
        h = np.where(active[:, None], upd, h)
    le = h.astype("<u4").view(np.uint8).reshape(n, 16)
    return [le[i].tobytes() for i in range(n)]


def md5_hex_batch(msgs: list[bytes]) -> list[str]:
    return [d.hex() for d in md5_batch(msgs)]


# --- SHA-1 (FIPS 180-1) -----------------------------------------------------


def sha1_batch(msgs: list[bytes]) -> list[bytes]:
    from ..operators.gitpack import sha1 as _sha1_scalar
    return _grouped(msgs, _sha1_batch_lanes, _sha1_scalar)


def _sha1_batch_lanes(msgs: list[bytes]) -> list[bytes]:
    cube, nblk = _pad_blocks(msgs, little=False)
    n = len(msgs)
    h = np.empty((n, 5), dtype=np.uint32)
    for j, v in enumerate((0x67452301, 0xEFCDAB89, 0x98BADCFE,
                           0x10325476, 0xC3D2E1F0)):
        h[:, j] = _U32(v)
    for blk in range(cube.shape[1]):
        active = nblk > blk
        w = [cube[:, blk, t] for t in range(16)]
        for t in range(16, 80):
            w.append(_rotl32(w[t - 3] ^ w[t - 8] ^ w[t - 14] ^ w[t - 16],
                             1))
        a, b, c, d, e = (h[:, 0].copy(), h[:, 1].copy(), h[:, 2].copy(),
                         h[:, 3].copy(), h[:, 4].copy())
        for t in range(80):
            if t < 20:
                f = (b & c) | (~b & d)
                k = _U32(0x5A827999)
            elif t < 40:
                f = b ^ c ^ d
                k = _U32(0x6ED9EBA1)
            elif t < 60:
                f = (b & c) | (b & d) | (c & d)
                k = _U32(0x8F1BBCDC)
            else:
                f = b ^ c ^ d
                k = _U32(0xCA62C1D6)
            tmp = _rotl32(a, 5) + f + e + k + w[t]
            e, d, c, b, a = d, c, _rotl32(b, 30), a, tmp
        upd = np.stack([h[:, 0] + a, h[:, 1] + b, h[:, 2] + c,
                        h[:, 3] + d, h[:, 4] + e], axis=1)
        h = np.where(active[:, None], upd, h)
    be = h.astype(">u4").view(np.uint8).reshape(n, 20)
    return [be[i].tobytes() for i in range(n)]


def sha1_hex_batch(msgs: list[bytes]) -> list[str]:
    return [d.hex() for d in sha1_batch(msgs)]


# --- SHA-256 (FIPS 180-4) ---------------------------------------------------

from .hashes import _SHA256_K  # noqa: E402 — same derived constants

_SHA256_KV = np.array(_SHA256_K, dtype=np.uint32)
_SHA256_H0 = (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
              0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)


def sha256_batch(msgs: list[bytes]) -> list[bytes]:
    from .hashes import sha256 as _sha256_scalar
    return _grouped(msgs, _sha256_batch_lanes, _sha256_scalar)


def _sha256_batch_lanes(msgs: list[bytes]) -> list[bytes]:
    cube, nblk = _pad_blocks(msgs, little=False)
    n = len(msgs)
    h = np.empty((n, 8), dtype=np.uint32)
    for j, v in enumerate(_SHA256_H0):
        h[:, j] = _U32(v)
    for blk in range(cube.shape[1]):
        active = nblk > blk
        w = [cube[:, blk, t] for t in range(16)]
        for t in range(16, 64):
            s0 = (_rotr32(w[t - 15], 7) ^ _rotr32(w[t - 15], 18)
                  ^ (w[t - 15] >> _U32(3)))
            s1 = (_rotr32(w[t - 2], 17) ^ _rotr32(w[t - 2], 19)
                  ^ (w[t - 2] >> _U32(10)))
            w.append(w[t - 16] + s0 + w[t - 7] + s1)
        a, b, c, d, e, f, g, hh = (h[:, j].copy() for j in range(8))
        for t in range(64):
            s1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = hh + s1 + ch + _SHA256_KV[t] + w[t]
            s0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0 + maj
            hh, g, f, e, d, c, b, a = (g, f, e, d + t1,
                                       c, b, a, t1 + t2)
        upd = np.stack([h[:, 0] + a, h[:, 1] + b, h[:, 2] + c,
                        h[:, 3] + d, h[:, 4] + e, h[:, 5] + f,
                        h[:, 6] + g, h[:, 7] + hh], axis=1)
        h = np.where(active[:, None], upd, h)
    be = h.astype(">u4").view(np.uint8).reshape(n, 32)
    return [be[i].tobytes() for i in range(n)]


def sha256_hex_batch(msgs: list[bytes]) -> list[str]:
    return [d.hex() for d in sha256_batch(msgs)]


# --- HMAC (RFC 2104) / PBKDF2 (RFC 2898) over the batch SHA-256 -------------


def hmac_sha256_batch(key: bytes, msgs: list[bytes]) -> list[bytes]:
    """One fixed key, a batch of messages (the pbkdf2 shape)."""
    if len(key) > 64:
        key = sha256_batch([key])[0]
    key = key + b"\x00" * (64 - len(key))
    ipad = bytes(b ^ 0x36 for b in key)
    opad = bytes(b ^ 0x5C for b in key)
    inner = sha256_batch([ipad + m for m in msgs])
    return sha256_batch([opad + d for d in inner])


def pbkdf2_hmac_sha256_batch(password: bytes, salts: list[bytes],
                             iterations: int, dklen: int = 32
                             ) -> list[bytes]:
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if dklen > 32:
        raise ValueError("batch path supports a single PBKDF2 block")
    n = len(salts)
    u = hmac_sha256_batch(password, [s + b"\x00\x00\x00\x01"
                                     for s in salts])
    acc = np.array([np.frombuffer(x, dtype=np.uint8) for x in u]) \
        if n else np.zeros((0, 32), dtype=np.uint8)
    for _ in range(iterations - 1):
        u = hmac_sha256_batch(password, u)
        acc = acc ^ np.array([np.frombuffer(x, dtype=np.uint8)
                              for x in u])
    return [acc[i].tobytes()[:dklen] for i in range(n)]
