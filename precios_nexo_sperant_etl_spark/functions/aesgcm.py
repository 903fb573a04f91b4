"""From-scratch AES (FIPS-197) + GCM (NIST SP 800-38D).

The envelope-encryption primitive for data at rest: at fleet scale,
sensitive columns ship client-side-encrypted and each task decrypts
only the rows it scans, so the codec must live where the partitions
are. No crypto library is imported here; the S-box is DERIVED from
the defining GF(2^8) inversion + affine transform (not transcribed),
and the INDEPENDENT implementation pinned against in
``tests/test_aesgcm.py`` is the JVM's ``javax.crypto``
(AES/GCM/NoPadding) in both directions, plus the NIST GCM test
vectors.

Scope: AES-128/192/256 block cipher, CTR keystream, GCM with 96-bit
and arbitrary-length IVs, AAD, and full 16-byte tags. Decrypt refuses
on tag mismatch — authenticity is the point of GCM; a silent
wrong-plaintext return would be the same class of bug as an unchecked
checksum in the container codecs.
"""

from __future__ import annotations

import struct


class AesError(ValueError):
    pass


# --- S-box derived from the spec's defining formula -------------------------

def _gf_mul8(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _gf_inv8(a: int) -> int:
    # a^254 in GF(2^8) (Fermat); inv(0) = 0 by the spec's convention
    r = 1
    for _ in range(254):
        r = _gf_mul8(r, a)
    return r


def _mk_sbox() -> tuple[list[int], list[int]]:
    sbox = [0] * 256
    for x in range(256):
        b = _gf_inv8(x)
        s = 0
        for i in range(8):
            bit = ((b >> i) & 1) ^ ((b >> ((i + 4) % 8)) & 1) \
                ^ ((b >> ((i + 5) % 8)) & 1) ^ ((b >> ((i + 6) % 8)) & 1) \
                ^ ((b >> ((i + 7) % 8)) & 1) ^ ((0x63 >> i) & 1)
            s |= bit << i
        sbox[x] = s
    inv = [0] * 256
    for x, s in enumerate(sbox):
        inv[s] = x
    return sbox, inv


_SBOX, _INV_SBOX = _mk_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise AesError("AES key must be 128/192/256 bits")
    nr = nk + 6
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [sum(words[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _mix_single(col: list[int]) -> list[int]:
    a, b, c, d = col
    return [_gf_mul8(a, 2) ^ _gf_mul8(b, 3) ^ c ^ d,
            a ^ _gf_mul8(b, 2) ^ _gf_mul8(c, 3) ^ d,
            a ^ b ^ _gf_mul8(c, 2) ^ _gf_mul8(d, 3),
            _gf_mul8(a, 3) ^ b ^ c ^ _gf_mul8(d, 2)]


def _inv_mix_single(col: list[int]) -> list[int]:
    a, b, c, d = col
    return [_gf_mul8(a, 14) ^ _gf_mul8(b, 11) ^ _gf_mul8(c, 13)
            ^ _gf_mul8(d, 9),
            _gf_mul8(a, 9) ^ _gf_mul8(b, 14) ^ _gf_mul8(c, 11)
            ^ _gf_mul8(d, 13),
            _gf_mul8(a, 13) ^ _gf_mul8(b, 9) ^ _gf_mul8(c, 14)
            ^ _gf_mul8(d, 11),
            _gf_mul8(a, 11) ^ _gf_mul8(b, 13) ^ _gf_mul8(c, 9)
            ^ _gf_mul8(d, 14)]


# column-major state (FIPS-197 layout): state[r][c] = in[r + 4c]

def encrypt_block(round_keys: list[list[int]], block: bytes) -> bytes:
    nr = len(round_keys) - 1
    s = [block[i] ^ round_keys[0][i] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major flat layout
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd != nr:
            out = []
            for c in range(4):
                out += _mix_single(s[4 * c:4 * c + 4])
            s = out
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
    return bytes(s)


def decrypt_block(round_keys: list[list[int]], block: bytes) -> bytes:
    nr = len(round_keys) - 1
    s = [block[i] ^ round_keys[nr][i] for i in range(16)]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows then InvSubBytes
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
        if rnd != 0:
            out = []
            for c in range(4):
                out += _inv_mix_single(s[4 * c:4 * c + 4])
            s = out
    return bytes(s)


def aes_key(key: bytes) -> list[list[int]]:
    return _expand_key(key)


# --- GCM (NIST SP 800-38D) --------------------------------------------------

_R = 0xE1 << 120


def _gmul(x: int, y: int) -> int:
    z = 0
    v = y
    for i in range(127, -1, -1):
        if (x >> i) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ _R
        else:
            v >>= 1
    return z


def _ghash(h: int, *segments: bytes) -> int:
    y = 0
    for seg in segments:
        for off in range(0, len(seg), 16):
            blk = seg[off:off + 16].ljust(16, b"\x00")
            y = _gmul(y ^ int.from_bytes(blk, "big"), h)
    return y


def _inc32(j: bytes) -> bytes:
    n = (int.from_bytes(j[12:], "big") + 1) & 0xFFFFFFFF
    return j[:12] + n.to_bytes(4, "big")


def _ctr(rk, j0: bytes, data: bytes) -> bytes:
    out = bytearray()
    ctr = j0
    for off in range(0, len(data), 16):
        ctr = _inc32(ctr)
        ks = encrypt_block(rk, ctr)
        chunk = data[off:off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


def _j0(rk, h: int, iv: bytes) -> bytes:
    if len(iv) == 12:
        return iv + b"\x00\x00\x00\x01"
    lens = struct.pack(">QQ", 0, len(iv) * 8)
    return _ghash(h, iv, lens).to_bytes(16, "big") if len(iv) % 16 == 0 \
        else _ghash(h, iv + b"\x00" * (-len(iv) % 16),
                    lens).to_bytes(16, "big")


def gcm_encrypt(key: bytes, iv: bytes, plaintext: bytes,
                aad: bytes = b"") -> tuple[bytes, bytes]:
    """Returns (ciphertext, 16-byte tag)."""
    rk = _expand_key(key)
    h = int.from_bytes(encrypt_block(rk, b"\x00" * 16), "big")
    j0 = _j0(rk, h, iv)
    ct = _ctr(rk, j0, plaintext)
    lens = struct.pack(">QQ", len(aad) * 8, len(ct) * 8)
    s = _ghash(h, aad + b"\x00" * (-len(aad) % 16),
               ct + b"\x00" * (-len(ct) % 16), lens)
    tag = bytes(a ^ b for a, b in zip(
        s.to_bytes(16, "big"), encrypt_block(rk, j0)))
    return ct, tag


def gcm_decrypt(key: bytes, iv: bytes, ciphertext: bytes, tag: bytes,
                aad: bytes = b"") -> bytes:
    """Raises AesError on authentication failure (never returns
    unauthenticated plaintext)."""
    rk = _expand_key(key)
    h = int.from_bytes(encrypt_block(rk, b"\x00" * 16), "big")
    j0 = _j0(rk, h, iv)
    lens = struct.pack(">QQ", len(aad) * 8, len(ciphertext) * 8)
    s = _ghash(h, aad + b"\x00" * (-len(aad) % 16),
               ciphertext + b"\x00" * (-len(ciphertext) % 16), lens)
    want = bytes(a ^ b for a, b in zip(
        s.to_bytes(16, "big"), encrypt_block(rk, j0)))
    import hmac as _hmac
    if not _hmac.compare_digest(want, tag):
        raise AesError("GCM tag mismatch: ciphertext or AAD tampered, "
                       "or wrong key/IV")
    return _ctr(rk, j0, ciphertext)
