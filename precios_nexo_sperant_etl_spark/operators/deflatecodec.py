"""From-scratch DEFLATE (RFC 1951) with zlib (RFC 1950) and gzip
(RFC 1952) wrappers — completing the from-scratch compression suite
(zstd, bzip2, LZMA/xz, now deflate): stored, static-Huffman and
dynamic-Huffman blocks on both encode and decode, an LZ77 hash-chain
matcher, the 16/17/18 RLE code-length coding, Adler-32 and CRC-32
trailers.

Bit order discipline (the part every port gets wrong once): DEFLATE
packs everything LSB-first EXCEPT Huffman codes, which are packed
starting from the MOST significant bit of the code — so the decoder
accumulates ``code = (code << 1) | next_bit`` while reading an
LSB-first stream, and the encoder writes each code bit-reversed.

Independence: pinned both directions against the stdlib ``zlib`` /
``gzip`` modules in tests (their encoder at levels 0/1/6/9 → this
inflate; this deflate → their decompress), the same external-
implementation discipline as the other codecs. The stdlib zlib stays
on the hot path where it already serves (PNG IDAT, .warc.gz) — this
module is the spec-complete reference implementation plus the
driver-checked roundtrip surface.
"""

from __future__ import annotations

_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
             35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
              3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0]
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97,
              129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073,
              4097, 6145, 8193, 12289, 16385, 24577]
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
               7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
              14, 1, 15]


class DeflateError(ValueError):
    pass


def adler32(data: bytes) -> int:
    a, b = 1, 0
    for i in range(0, len(data), 5552):      # largest n before mod needed
        chunk = data[i:i + 5552]
        for byte in chunk:
            a += byte
            b += a
        a %= 65521
        b %= 65521
    return (b << 16) | a


def _mk_crc32():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_CRC_TBL = _mk_crc32()


def crc32(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _CRC_TBL[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


# --- LSB-first bit I/O -------------------------------------------------------

class _BitReader:
    __slots__ = ("d", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0                          # bit position
        self.nbits = len(data) << 3

    def bits(self, n: int) -> int:
        # one int.from_bytes over the covering bytes instead of a
        # per-bit loop (same LSB-first semantics)
        p = self.pos
        end = p + n
        if end > self.nbits:
            raise DeflateError("deflate: truncated stream")
        v = int.from_bytes(self.d[p >> 3:(end + 7) >> 3], "little") \
            >> (p & 7)
        self.pos = end
        return v & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to ``n`` look-ahead bits, zero-padded past the end (the
        table decoder peeks a fixed width; codes that would need the
        padding are rejected by the post-skip bounds check)."""
        p = self.pos
        return (int.from_bytes(self.d[p >> 3:(p + n + 7) >> 3],
                               "little") >> (p & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise DeflateError("deflate: truncated stream")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def bits(self, v: int, n: int) -> None:        # LSB-first
        self.acc |= (v & ((1 << n) - 1)) << self.nb
        self.nb += n
        while self.nb >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nb -= 8

    def huff(self, code: int, n: int) -> None:     # MSB-first (reversed)
        rev = 0
        for _ in range(n):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.bits(rev, n)

    def align(self) -> None:
        if self.nb:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nb = 0

    def finish(self) -> bytes:
        self.align()
        return bytes(self.out)


# --- canonical Huffman -------------------------------------------------------

def _codes_from_lengths(lengths: list[int]) -> list[int]:
    """RFC 1951 §3.2.2 canonical code assignment."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    out = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


_TBITS = 10  # primary-table width (zlib-style one-shot decode)


class _Decoder:
    """Canonical decoder: a 2^_TBITS one-shot primary table (entry =
    length << 16 | symbol, indexed by the next _TBITS LSB-first stream
    bits) with the classic count/offset walk as the fallback for the
    rare codes longer than the table width. Same code assignment as
    before — only the lookup mechanics changed."""

    __slots__ = ("max_len", "counts", "symbols", "table")

    def __init__(self, lengths: list[int]) -> None:
        max_len = max(lengths) if lengths else 0
        if max_len == 0:
            self.max_len = 0
            return
        self.max_len = max_len
        counts = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        self.counts = counts
        # counting-sort symbol placement (O(n), not O(n * max_len))
        offs = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            offs[ln + 1] = offs[ln] + counts[ln]
        symbols = [0] * offs[max_len + 1]
        place = offs[:]
        for sym, ln in enumerate(lengths):
            if ln:
                symbols[place[ln]] = sym
                place[ln] += 1
        self.symbols = symbols
        # sanity: over-subscribed code
        left = 1
        for ln in range(1, max_len + 1):
            left = (left << 1) - counts[ln]
            if left < 0:
                raise DeflateError("deflate: over-subscribed code")
        # primary table over the canonical codes (RFC 1951 §3.2.2),
        # bit-reversed because the stream delivers code MSB first into
        # an LSB-first reader
        table = [0] * (1 << _TBITS)
        code = 0
        idx = 0
        for ln in range(1, max_len + 1):
            for _ in range(counts[ln]):
                sym = symbols[idx]
                idx += 1
                if ln <= _TBITS:
                    rev = 0
                    c = code
                    for _b in range(ln):
                        rev = (rev << 1) | (c & 1)
                        c >>= 1
                    # one strided slice store per symbol (C speed)
                    # instead of a Python loop over the 2^(T-ln) copies
                    table[rev::1 << ln] = \
                        [(ln << 16) | sym] * (1 << (_TBITS - ln))
                code += 1
            code <<= 1
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.max_len == 0:
            raise DeflateError("deflate: invalid Huffman code")
        entry = self.table[br.peek(_TBITS)]
        if entry:
            br.skip(entry >> 16)
            return entry & 0xFFFF
        return self._read_slow(br)

    def _read_slow(self, br: _BitReader) -> int:
        code = 0
        first = 0
        index = 0
        for ln in range(1, self.max_len + 1):
            code |= br.bits(1)
            count = self.counts[ln]
            if code - first < count:
                return self.symbols[index + (code - first)]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise DeflateError("deflate: invalid Huffman code")


_STATIC_LIT = _Decoder([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_STATIC_DIST = _Decoder([5] * 30)
_STATIC_LIT_LENS = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
_STATIC_DIST_LENS = [5] * 30


# --- inflate -----------------------------------------------------------------

def inflate(data: bytes) -> bytes:
    return inflate_stream(data, 0)[0]


def inflate_stream(data: bytes, offset: int = 0) -> tuple[bytes, int]:
    """Inflate one deflate stream starting at byte ``offset`` and
    report the byte position just past its final block — the embedded-
    stream use (git packfiles concatenate zlib members back-to-back
    with no length framing; only the decoder knows where one ends)."""
    br = _BitReader(data)
    br.pos = offset << 3
    out = bytearray()
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 0:                        # stored
            br.align()
            p = br.pos >> 3
            if p + 4 > len(data):
                raise DeflateError("deflate: truncated stored header")
            ln = int.from_bytes(data[p:p + 2], "little")
            nln = int.from_bytes(data[p + 2:p + 4], "little")
            if ln != (~nln & 0xFFFF):
                raise DeflateError("deflate: stored LEN/NLEN mismatch")
            out.extend(data[p + 4:p + 4 + ln])
            br.pos = (p + 4 + ln) << 3
        elif btype in (1, 2):
            if btype == 1:
                lit_dec, dist_dec = _STATIC_LIT, _STATIC_DIST
            else:
                hlit = br.bits(5) + 257
                hdist = br.bits(5) + 1
                hclen = br.bits(4) + 4
                cl_lens = [0] * 19
                for i in range(hclen):
                    cl_lens[_CLC_ORDER[i]] = br.bits(3)
                cl_dec = _Decoder(cl_lens)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = cl_dec.read(br)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        if not lens:
                            raise DeflateError("deflate: repeat at start")
                        lens.extend([lens[-1]] * (3 + br.bits(2)))
                    elif sym == 17:
                        lens.extend([0] * (3 + br.bits(3)))
                    else:
                        lens.extend([0] * (11 + br.bits(7)))
                if len(lens) != hlit + hdist:
                    raise DeflateError("deflate: code-length overflow")
                lit_dec = _Decoder(lens[:hlit])
                dist_dec = _Decoder(lens[hlit:])
            while True:
                sym = lit_dec.read(br)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise DeflateError("deflate: bad length symbol")
                    li = sym - 257
                    length = _LEN_BASE[li] + br.bits(_LEN_EXTRA[li])
                    dsym = dist_dec.read(br)
                    if dsym > 29:
                        raise DeflateError("deflate: bad distance symbol")
                    dist = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise DeflateError("deflate: distance too far back")
                    start = len(out) - dist
                    if dist >= length:
                        out += out[start:start + length]
                    else:
                        # overlapping copy: the last `dist` bytes repeat
                        pattern = out[start:]
                        out += (pattern * (length // dist + 1))[:length]
        else:
            raise DeflateError("deflate: reserved block type")
        if bfinal:
            break
    return bytes(out), (br.pos + 7) >> 3


def zlib_decompress_stream(buf: bytes, offset: int = 0) \
        -> tuple[bytes, int]:
    """Decode one zlib member embedded at ``offset``; returns
    (content, position past the Adler-32 trailer)."""
    if offset + 6 > len(buf):
        raise DeflateError("zlib: truncated")
    cmf, flg = buf[offset], buf[offset + 1]
    if cmf & 0x0F != 8:
        raise DeflateError("zlib: not deflate")
    if (cmf * 256 + flg) % 31:
        raise DeflateError("zlib: bad header check")
    if flg & 0x20:
        raise DeflateError("zlib: preset dictionary unsupported")
    content, end = inflate_stream(buf, offset + 2)
    if end + 4 > len(buf):
        raise DeflateError("zlib: truncated Adler-32 trailer")
    if adler32(content) != int.from_bytes(buf[end:end + 4], "big"):
        raise DeflateError("zlib: Adler-32 mismatch")
    return content, end + 4


def zlib_decompress(blob: bytes) -> bytes:
    if len(blob) < 6:
        raise DeflateError("zlib: truncated")
    cmf, flg = blob[0], blob[1]
    if cmf & 0x0F != 8:
        raise DeflateError("zlib: not deflate")
    if (cmf * 256 + flg) % 31:
        raise DeflateError("zlib: bad header check")
    if flg & 0x20:
        raise DeflateError("zlib: preset dictionary unsupported")
    content = inflate(blob[2:-4])
    if adler32(content) != int.from_bytes(blob[-4:], "big"):
        raise DeflateError("zlib: Adler-32 mismatch")
    return content


def gzip_decompress(blob: bytes) -> bytes:
    if blob[:3] != b"\x1f\x8b\x08":
        raise DeflateError("gzip: bad magic/method")
    flg = blob[3]
    pos = 10
    if flg & 0x04:                            # FEXTRA
        xlen = int.from_bytes(blob[pos:pos + 2], "little")
        pos += 2 + xlen
    for bit in (0x08, 0x10):                  # FNAME, FCOMMENT
        if flg & bit:
            pos = blob.index(b"\x00", pos) + 1
    if flg & 0x02:                            # FHCRC
        pos += 2
    content = inflate(blob[pos:-8])
    if crc32(content) != int.from_bytes(blob[-8:-4], "little"):
        raise DeflateError("gzip: CRC-32 mismatch")
    if len(content) & 0xFFFFFFFF != \
            int.from_bytes(blob[-4:], "little"):
        raise DeflateError("gzip: ISIZE mismatch")
    return content


# --- deflate encoder (dynamic Huffman, LZ77 hash chains) ---------------------

def _mk_code_tbl(bases: list[int], top: int) -> bytes:
    """Direct value→code-index table derived from the base arrays (the
    per-token reverse linear scans were the encoder's hottest calls)."""
    tbl = bytearray(top + 1)
    i = 0
    for v in range(bases[0], top + 1):
        while i + 1 < len(bases) and v >= bases[i + 1]:
            i += 1
        tbl[v] = i
    return bytes(tbl)


_LEN_CODE_TBL = None   # built lazily from _LEN_BASE/_DIST_BASE below
_DIST_CODE_TBL = None


def _len_code(length: int) -> int:
    global _LEN_CODE_TBL
    if _LEN_CODE_TBL is None:
        _LEN_CODE_TBL = _mk_code_tbl(_LEN_BASE, 258)
    if not 3 <= length <= 258:
        raise DeflateError("deflate: bad match length")
    return _LEN_CODE_TBL[length]


def _dist_code(dist: int) -> int:
    global _DIST_CODE_TBL
    if _DIST_CODE_TBL is None:
        _DIST_CODE_TBL = _mk_code_tbl(_DIST_BASE, 32768)
    if not 1 <= dist <= 32768:
        raise DeflateError("deflate: bad match distance")
    return _DIST_CODE_TBL[dist]


def _lz77(data: bytes, max_chain: int = 32):
    """Greedy hash-chain matcher: yields (literal_byte, None) or
    (length, dist) tokens."""
    n = len(data)
    head: dict[int, list[int]] = {}
    tokens = []
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 3 <= n:
            key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            chain = head.get(key)
            if chain:
                for j in reversed(chain[-max_chain:]):
                    if i - j > 32768:
                        break
                    ln = 0
                    maxl = min(258, n - i)
                    while ln < maxl and data[j + ln] == data[i + ln]:
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, i - j
                        if ln >= 64:
                            break
        if best_len >= 3:
            tokens.append((best_len, best_dist))
            for k in range(i, min(i + best_len, n - 2)):
                key = data[k] | (data[k + 1] << 8) | (data[k + 2] << 16)
                head.setdefault(key, []).append(k)
            i += best_len
        else:
            tokens.append((data[i], None))
            if i + 3 <= n:
                key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
                head.setdefault(key, []).append(i)
            i += 1
    return tokens


def _huff_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Huffman code lengths capped at ``max_len`` (flatten fallback,
    valid for the DEFLATE alphabet sizes). Symbols with zero frequency
    get length 0 (no code)."""
    import heapq
    live = [i for i, f in enumerate(freqs) if f]
    if not live:
        return [0] * len(freqs)
    if len(live) == 1:
        lens = [0] * len(freqs)
        lens[live[0]] = 1
        return lens
    heap = [(freqs[i], i, (i,)) for i in live]
    heapq.heapify(heap)
    lens = [0] * len(freqs)
    while len(heap) > 1:
        fa, ia, sa = heapq.heappop(heap)
        fb, ib, sb = heapq.heappop(heap)
        for s in sa + sb:
            lens[s] += 1
        heapq.heappush(heap, (fa + fb, min(ia, ib), sa + sb))
    if max(lens) > max_len:
        flat = max(1, (len(live) - 1).bit_length())
        if flat > max_len:
            raise DeflateError("deflate: cannot flatten code")
        for i in live:
            lens[i] = flat
    return lens


def _encode_cl_rle(lens: list[int]):
    """RFC 1951 §3.2.7 code-length RLE: yields (symbol, extra, nbits)."""
    out = []
    i = 0
    n = len(lens)
    while i < n:
        v = lens[i]
        j = i + 1
        while j < n and lens[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                r = min(run, 138)
                out.append((18, r - 11, 7))
                run -= r
            if run >= 3:
                out.append((17, run - 3, 3))
                run = 0
            out.extend([(0, 0, 0)] * run)
        else:
            out.append((v, 0, 0))
            run -= 1
            while run >= 3:
                r = min(run, 6)
                out.append((16, r - 3, 2))
                run -= r
            out.extend([(v, 0, 0)] * run)
        i = j
    return out


def deflate(data: bytes) -> bytes:
    """One dynamic-Huffman DEFLATE block (plus the stored fallback for
    incompressible data)."""
    tokens = _lz77(data)
    lit_freq = [0] * 286
    dist_freq = [0] * 30
    for a, b in tokens:
        if b is None:
            lit_freq[a] += 1
        else:
            lit_freq[257 + _len_code(a)] += 1
            dist_freq[_dist_code(b)] += 1
    lit_freq[256] += 1
    lit_lens = _huff_lengths(lit_freq, 15)
    dist_lens = _huff_lengths(dist_freq, 15)
    if max(dist_lens) == 0:
        dist_lens[0] = 1                      # at least one dist code
    hlit = 286
    while hlit > 257 and lit_lens[hlit - 1] == 0:
        hlit -= 1
    hdist = 30
    while hdist > 1 and dist_lens[hdist - 1] == 0:
        hdist -= 1
    cl_seq = _encode_cl_rle(lit_lens[:hlit] + dist_lens[:hdist])
    cl_freq = [0] * 19
    for sym, _, _ in cl_seq:
        cl_freq[sym] += 1
    cl_lens = _huff_lengths(cl_freq, 7)
    hclen = 19
    while hclen > 4 and cl_lens[_CLC_ORDER[hclen - 1]] == 0:
        hclen -= 1
    # bit-reverse every code ONCE per tree (w.huff reversed per call —
    # it was the hottest writer function); w.bits emits the reversed
    # code directly
    def _rev_codes(codes: list[int], lens: list[int]) -> list[int]:
        out = [0] * len(codes)
        for s, (c, ln) in enumerate(zip(codes, lens)):
            r = 0
            for _ in range(ln):
                r = (r << 1) | (c & 1)
                c >>= 1
            out[s] = r
        return out

    lit_codes = _rev_codes(_codes_from_lengths(lit_lens), lit_lens)
    dist_codes = _rev_codes(_codes_from_lengths(dist_lens), dist_lens)
    cl_codes = _rev_codes(_codes_from_lengths(cl_lens), cl_lens)
    w = _BitWriter()
    w.bits(1, 1)                              # BFINAL
    w.bits(2, 2)                              # dynamic
    w.bits(hlit - 257, 5)
    w.bits(hdist - 1, 5)
    w.bits(hclen - 4, 4)
    for i in range(hclen):
        w.bits(cl_lens[_CLC_ORDER[i]], 3)
    for sym, extra, nbits in cl_seq:
        w.bits(cl_codes[sym], cl_lens[sym])
        if nbits:
            w.bits(extra, nbits)
    wbits = w.bits
    for a, b in tokens:
        if b is None:
            wbits(lit_codes[a], lit_lens[a])
        else:
            lc = _len_code(a)
            wbits(lit_codes[257 + lc], lit_lens[257 + lc])
            if _LEN_EXTRA[lc]:
                wbits(a - _LEN_BASE[lc], _LEN_EXTRA[lc])
            dc = _dist_code(b)
            wbits(dist_codes[dc], dist_lens[dc])
            if _DIST_EXTRA[dc]:
                wbits(b - _DIST_BASE[dc], _DIST_EXTRA[dc])
    wbits(lit_codes[256], lit_lens[256])
    dyn = w.finish()
    # stored fallback: 5-byte overhead per 65535 chunk
    stored_size = 1 + sum(5 + min(65535, max(1, len(data) - i))
                          for i in range(0, max(len(data), 1), 65535))
    if len(dyn) > stored_size:
        w = _BitWriter()
        n = len(data)
        if n == 0:
            w.bits(1, 1)
            w.bits(0, 2)
            w.align()
            w.out.extend(b"\x00\x00\xff\xff")
            return w.finish()
        for i in range(0, n, 65535):
            chunk = data[i:i + 65535]
            w.bits(1 if i + 65535 >= n else 0, 1)
            w.bits(0, 2)
            w.align()
            w.out.extend(len(chunk).to_bytes(2, "little"))
            w.out.extend((~len(chunk) & 0xFFFF).to_bytes(2, "little"))
            w.out.extend(chunk)
        return w.finish()
    return dyn


def zlib_compress(data: bytes) -> bytes:
    return (b"\x78\x9c" + deflate(data)
            + adler32(data).to_bytes(4, "big"))


def gzip_compress(data: bytes) -> bytes:
    return (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff" + deflate(data)
            + crc32(data).to_bytes(4, "little")
            + (len(data) & 0xFFFFFFFF).to_bytes(4, "little"))
