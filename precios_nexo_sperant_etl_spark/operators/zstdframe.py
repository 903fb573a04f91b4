"""Zstandard FRAME layer — stdlib only (RFC 8878).

Web corpora and dataset releases increasingly ship ``.zst`` members
(Common Crawl distributes WET/WARC as zstd since 2023), so the ingest
seam needs to walk zstd frames the same way it walks gzip members and
tar shards. This module implements the frame format from the public
RFC: magic number, frame-header descriptor (content-size flag,
single-segment, checksum, dictionary-ID fields), window descriptor,
and the 3-byte block headers (last-block bit, 2-bit type, 21-bit
size).

Raw_Block and RLE_Block are decoded COMPLETELY — they are literal
layers with no entropy coding, and an encoder is provided so
roundtrips construct genuine frames. Compressed_Block requires the
FSE/Huffman entropy stack; that is the same honest codec-library
boundary as progressive-JPEG-without-libjpeg used to be — the decoder
raises :class:`UnsupportedZstd` (NOT corrupt) so callers fall back to
a structural probe, and a real deployment binds libzstd behind this
exact seam. Reserved block type 3 and every framing violation raise
``ValueError`` with a named reason — same unclean-path taxonomy as
the other decoders.
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528


class UnsupportedZstd(ValueError):
    """Valid zstd, outside the implemented (entropy-free) subset
    (ValueError subclass so the uniform fail-cleanly fuzz contract
    covers it, same as UnsupportedJpeg)."""


def encode_zstd_raw(data: bytes, block_size: int = 64) -> bytes:
    """Frame ``data`` as one zstd frame of Raw/RLE blocks: a chunk
    that is a single repeated byte becomes an RLE block (type 1,
    1-byte payload), anything else a Raw block (type 0). Single-
    segment frame, 4-byte frame-content-size, no checksum."""
    if not data:
        raise ValueError("zstd: empty content needs a last zero block")
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    # FHD: FCS-flag=2 (4-byte), single-segment=1, no checksum, no dict.
    out.append((2 << 6) | (1 << 5))
    out += len(data).to_bytes(4, "little")
    for off in range(0, len(data), block_size):
        chunk = data[off:off + block_size]
        last = 1 if off + block_size >= len(data) else 0
        rle = chunk == bytes([chunk[0]]) * len(chunk)
        btype = 1 if rle else 0
        header = last | (btype << 1) | (len(chunk) << 3)
        out += header.to_bytes(3, "little")
        out += chunk[:1] if rle else chunk
    return bytes(out)


def decode_zstd_frame(payload: bytes) -> dict:
    """Walk one zstd frame: parse the header, decode every Raw/RLE
    block, verify the reassembled size against the frame-content-size
    field. Returns content plus per-type block counts and the total
    frame length."""
    if len(payload) < 5:
        raise ValueError("zstd: truncated frame header")
    if int.from_bytes(payload[:4], "little") != _MAGIC:
        raise ValueError("zstd: bad magic number")
    fhd = payload[4]
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise ValueError("zstd: reserved FHD bit set")
    has_checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 0x03]
    pos = 5
    window_log = None
    if not single_segment:
        if pos >= len(payload):
            raise ValueError("zstd: truncated window descriptor")
        wd = payload[pos]
        window_log = 10 + (wd >> 3)  # exponent part; mantissa adds /8ths
        pos += 1
    if did_size:
        pos += did_size
    fcs_size = (0, 2, 4, 8)[fcs_flag]
    if fcs_flag == 0 and single_segment:
        fcs_size = 1
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(payload):
            raise ValueError("zstd: truncated frame-content-size")
        fcs = int.from_bytes(payload[pos:pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size

    content = bytearray()
    n_raw = n_rle = 0
    while True:
        if pos + 3 > len(payload):
            raise ValueError("zstd: truncated block header")
        header = int.from_bytes(payload[pos:pos + 3], "little")
        pos += 3
        last, btype, bsize = header & 1, (header >> 1) & 3, header >> 3
        if btype == 0:
            if pos + bsize > len(payload):
                raise ValueError("zstd: truncated raw block")
            content += payload[pos:pos + bsize]
            pos += bsize
            n_raw += 1
        elif btype == 1:
            if pos + 1 > len(payload):
                raise ValueError("zstd: truncated RLE block")
            content += payload[pos:pos + 1] * bsize
            pos += 1
            n_rle += 1
        elif btype == 2:
            raise UnsupportedZstd(
                "Compressed_Block needs the FSE/Huffman entropy stack "
                "(libzstd slots behind this seam)")
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if has_checksum:
        if pos + 4 > len(payload):
            raise ValueError("zstd: truncated content checksum")
        pos += 4  # xxhash64 low half — not recomputed in the subset
    if fcs is not None and len(content) != fcs:
        raise ValueError("zstd: content size mismatch vs FCS")
    return {"content": bytes(content), "content_len": len(content),
            "n_raw": n_raw, "n_rle": n_rle,
            "n_blocks": n_raw + n_rle, "fcs": fcs,
            "single_segment": single_segment, "window_log": window_log,
            "frame_bytes": pos}
