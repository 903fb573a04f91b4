"""Zstandard FRAME layer — stdlib only (RFC 8878).

Web corpora and dataset releases increasingly ship ``.zst`` members
(Common Crawl distributes WET/WARC as zstd since 2023), so the ingest
seam needs to walk zstd frames the same way it walks gzip members and
tar shards. This module implements the frame format from the public
RFC: magic number, frame-header descriptor (content-size flag,
single-segment, checksum, dictionary-ID fields), window descriptor,
and the 3-byte block headers (last-block bit, 2-bit type, 21-bit
size).

All three block types decode COMPLETELY: Raw and RLE are literal
layers, and Compressed_Block runs the full RFC 8878 entropy stack
from :mod:`.zstdentropy` — Huffman literals (Raw / RLE / Compressed /
Treeless, 1- and 4-stream, direct or FSE-compressed weights) and
FSE-coded sequences (Predefined / RLE / FSE_Compressed / Repeat
modes, 3-slot repeat-offset history, cross-block window matches).
Encoders are provided for both the Raw/RLE framing and a
compressed-block path (Huffman literals + predefined-table
sequences) so roundtrips construct genuine entropy-coded frames.
Dictionary frames (Dictionary_ID != 0 content) remain the one
:class:`UnsupportedZstd` boundary. Reserved block type 3 and every
framing violation raise ``ValueError`` with a named reason — same
unclean-path taxonomy as the other decoders.
"""

from __future__ import annotations

from . import zstdentropy as _ze

_MAGIC = 0xFD2FB528


class UnsupportedZstd(ValueError):
    """Valid zstd, outside the implemented subset (ValueError subclass
    so the uniform fail-cleanly fuzz contract covers it, same as
    UnsupportedJpeg). Since the r10 dictionary support landed this is
    only dictionary-referencing frames decoded WITHOUT the matching
    dictionary."""


# ---------------------------------------------------------------------------
# Dictionaries (RFC 8878 §5): magic 0xEC30A437, Dictionary_ID, an
# entropy section (Huffman literals table, then FSE tables in OF/ML/LL
# order, then the 3 initial repeat offsets as u32 LE), then raw content
# that seeds the match window. A blob WITHOUT the magic is a raw-content
# dictionary: window seed only, no entropy tables, no ID.
# ---------------------------------------------------------------------------

_DICT_MAGIC = 0xEC30A437


def encode_zstd_dictionary(content: bytes, dict_id: int,
                           reps: tuple[int, int, int] = (1, 4, 8)) -> bytes:
    """Write a structured dictionary. The entropy section ships a flat
    256-symbol Huffman table (weight 1 each — covers any literal byte)
    and the three RFC predefined sequence distributions, so frames can
    open with Treeless literals and Repeat_Mode sequences regardless of
    payload; ``content`` seeds the match window and ``reps`` the
    repeat-offset history."""
    if not 1 <= dict_id <= 0xFFFFFFFF:
        raise ValueError("zstd: dictionary id must be a non-zero u32")
    if any(r <= 0 for r in reps):
        raise ValueError("zstd: dictionary repeat offsets must be > 0")
    out = bytearray(_DICT_MAGIC.to_bytes(4, "little"))
    out += dict_id.to_bytes(4, "little")
    # full-alphabet Huffman table: every byte representable, so any
    # literal payload can ride Treeless. A flat 256×weight-1 profile is
    # degenerate for the FSE weight coder (single-symbol histogram), so
    # use the Kraft-tight 3-tier profile 128×w1 + 64×w2 + 64×w3 = 2^9.
    out += _ze.huf_write_weights(
        {s: (1 if s < 128 else 2 if s < 192 else 3) for s in range(256)})
    out += _ze.fse_write_ncount(_ze.OF_DEFAULT, _ze.OF_DEFAULT_ACC)
    out += _ze.fse_write_ncount(_ze.ML_DEFAULT, _ze.ML_DEFAULT_ACC)
    out += _ze.fse_write_ncount(_ze.LL_DEFAULT, _ze.LL_DEFAULT_ACC)
    for r in reps:
        out += int(r).to_bytes(4, "little")
    out += content
    return bytes(out)


def parse_zstd_dictionary(blob: bytes) -> dict:
    """Parse a dictionary blob into the state a frame decode/encode
    starts from. Structured (magic-led) dictionaries yield entropy
    tables + repeat offsets + content; anything else is a raw-content
    dictionary (window seed only)."""
    if len(blob) < 8 or \
            int.from_bytes(blob[:4], "little") != _DICT_MAGIC:
        return {"dict_id": 0, "content": bytes(blob), "huf": None,
                "ctable": None, "max_bits": None, "seq_counts": None,
                "reps": [1, 4, 8]}
    dict_id = int.from_bytes(blob[4:8], "little")
    if dict_id == 0:
        raise ValueError("zstd: structured dictionary with id 0")
    pos = 8
    weights, n = _ze.huf_read_weights(blob[pos:])
    pos += n
    live = {s: w for s, w in weights.items() if w > 0}
    huf = _ze.huf_build_dtable(live)
    ctable, max_bits = _ze.huf_build_ctable(live)
    tables = {}
    for ch, acc_max, max_sym in (("of", 8, 31), ("ml", 9, 52),
                                 ("ll", 9, 35)):
        counts, acc, used = _ze.fse_read_ncount(blob[pos:], acc_max)
        if len(counts) - 1 > max_sym:
            raise ValueError(f"zstd: dictionary {ch} table symbol "
                             "out of range")
        tables[ch] = (counts, acc)
        pos += used
    if pos + 12 > len(blob):
        raise ValueError("zstd: truncated dictionary repeat offsets")
    reps = [int.from_bytes(blob[pos + 4 * i:pos + 4 * i + 4], "little")
            for i in range(3)]
    if any(r <= 0 for r in reps):
        raise ValueError("zstd: dictionary repeat offset must be > 0")
    pos += 12
    return {"dict_id": dict_id, "content": blob[pos:], "huf": huf,
            "ctable": ctable, "max_bits": max_bits,
            "seq_counts": tables, "reps": reps}


def _dict_state(dictionary) -> dict | None:
    """Normalize a dictionary argument (None / raw bytes / parsed dict)
    and expand the FSE count vectors into fresh decode tables — each
    frame mutates its table state, so tables are rebuilt per call."""
    if dictionary is None:
        return None
    d = parse_zstd_dictionary(dictionary) \
        if isinstance(dictionary, (bytes, bytearray)) else dict(dictionary)
    seq = _ze._SeqTables()
    if d.get("seq_counts"):
        for ch in ("ll", "of", "ml"):
            counts, acc = d["seq_counts"][ch]
            setattr(seq, ch, (_ze.fse_build_dtable(counts, acc), acc))
    d["seq"] = seq
    return d


def encode_zstd_raw(data: bytes, block_size: int = 64,
                    checksum: bool = False) -> bytes:
    """Frame ``data`` as one zstd frame of Raw/RLE blocks: a chunk
    that is a single repeated byte becomes an RLE block (type 1,
    1-byte payload), anything else a Raw block (type 0). Single-
    segment frame, 4-byte frame-content-size; ``checksum`` appends the
    XXH64-low-32 Content_Checksum (verified in decode)."""
    if not data:
        raise ValueError("zstd: empty content needs a last zero block")
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    # FHD: FCS-flag=2 (4-byte), single-segment=1, optional checksum.
    out.append((2 << 6) | (1 << 5) | (4 if checksum else 0))
    out += len(data).to_bytes(4, "little")
    for off in range(0, len(data), block_size):
        chunk = data[off:off + block_size]
        last = 1 if off + block_size >= len(data) else 0
        rle = chunk == bytes([chunk[0]]) * len(chunk)
        btype = 1 if rle else 0
        header = last | (btype << 1) | (len(chunk) << 3)
        out += header.to_bytes(3, "little")
        out += chunk[:1] if rle else chunk
    if checksum:
        out += (_ze.xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# Compressed_Block: literals section + sequences section (§4.2)
# ---------------------------------------------------------------------------


def _parse_literals(data: bytes, fstate: dict) -> tuple[bytes, int, str]:
    """Parse a Literals_Section (§4.2.1). Returns (literals, bytes
    consumed, type name). Updates ``fstate['huf']`` for Treeless reuse."""
    if not data:
        raise ValueError("zstd: empty literals section")
    b0 = data[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):                          # Raw / RLE
        if sf in (0, 2):
            regen, hdr = b0 >> 3, 1
        elif sf == 1:
            regen, hdr = (b0 >> 4) | (data[1] << 4), 2
        else:
            regen = (b0 >> 4) | (data[1] << 4) | (data[2] << 12)
            hdr = 3
        if ltype == 0:
            if hdr + regen > len(data):
                raise ValueError("zstd: truncated raw literals")
            return bytes(data[hdr:hdr + regen]), hdr + regen, "raw"
        if hdr + 1 > len(data):
            raise ValueError("zstd: truncated RLE literals")
        return bytes(data[hdr:hdr + 1]) * regen, hdr + 1, "rle"
    # Compressed (2) / Treeless (3)
    if sf == 0:
        v = int.from_bytes(data[:3], "little")
        regen, csize, hdr, nstreams = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3, 1
    elif sf == 1:
        v = int.from_bytes(data[:3], "little")
        regen, csize, hdr, nstreams = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3, 4
    elif sf == 2:
        v = int.from_bytes(data[:4], "little")
        regen, csize, hdr, nstreams = (v >> 4) & 0x3FFF, (v >> 18) & 0x3FFF, 4, 4
    else:
        v = int.from_bytes(data[:5], "little")
        regen, csize, hdr, nstreams = (v >> 4) & 0x3FFFF, (v >> 22) & 0x3FFFF, 5, 4
    blob = data[hdr:hdr + csize]
    if len(blob) != csize:
        raise ValueError("zstd: truncated compressed literals")
    if ltype == 2:
        weights, tree_n = _ze.huf_read_weights(blob)
        fstate["huf"] = _ze.huf_build_dtable(weights)
    else:
        if fstate.get("huf") is None:
            raise ValueError("zstd: treeless literals without a table")
        tree_n = 0
    dtable, max_bits = fstate["huf"]
    if nstreams == 1:
        lits = _ze.huf_decode_stream(blob[tree_n:], dtable, max_bits, regen)
    else:
        if tree_n + 6 > csize:
            raise ValueError("zstd: truncated literals jump table")
        s1 = int.from_bytes(blob[tree_n:tree_n + 2], "little")
        s2 = int.from_bytes(blob[tree_n + 2:tree_n + 4], "little")
        s3 = int.from_bytes(blob[tree_n + 4:tree_n + 6], "little")
        s4 = csize - tree_n - 6 - s1 - s2 - s3
        if s4 <= 0:
            raise ValueError("zstd: bad literals stream sizes")
        r123 = (regen + 3) // 4
        r4 = regen - 3 * r123
        if r4 < 0:
            raise ValueError("zstd: bad 4-stream regenerated size")
        p = tree_n + 6
        parts = []
        for sz, rg in ((s1, r123), (s2, r123), (s3, r123), (s4, r4)):
            parts.append(_ze.huf_decode_stream(blob[p:p + sz], dtable,
                                               max_bits, rg))
            p += sz
        lits = b"".join(parts)
    return lits, hdr + csize, "compressed" if ltype == 2 else "treeless"


def _decode_compressed_block(data: bytes, window: bytearray,
                             fstate: dict) -> dict:
    lits, consumed, lit_type = _parse_literals(data, fstate)
    seqs = _ze.decode_sequences(data[consumed:], fstate["seq"])
    content, fstate["reps"] = _ze.execute_sequences(
        lits, seqs, window, fstate["reps"])
    return {"lit_type": lit_type, "n_seq": len(seqs),
            "lit_len": len(lits),
            "match_len": sum(ml for _, _, ml in seqs)}


def _build_literals_section(lits: bytes, fstate_enc: dict | None = None,
                            lit_mode: str = "fresh") -> bytes:
    """Encode a literals section: RLE for a single repeated byte,
    Huffman-compressed when it helps (direct or FSE weights, 1 or 4
    streams), Raw otherwise — every choice deterministic in the data.

    ``lit_mode="treeless"`` re-uses the Huffman table the previous
    Compressed-literals block installed in ``fstate_enc`` (Treeless
    type 3 — no tree description bytes) when every byte of this block
    is covered by that table; otherwise it falls back to a fresh
    Compressed block. Raw/RLE blocks leave the installed table alone,
    matching decoder state semantics."""
    regen = len(lits)
    distinct = set(lits)

    def raw() -> bytes:
        if regen < 32:
            return bytes([0 | (regen << 3)]) + lits
        if regen < 4096:
            v = 0 | (1 << 2) | (regen << 4)
            return v.to_bytes(2, "little") + lits
        v = 0 | (3 << 2) | (regen << 4)
        return v.to_bytes(3, "little") + lits

    if regen == 0:
        return raw()
    if len(distinct) == 1:
        if regen < 32:
            return bytes([1 | (regen << 3), lits[0]])
        if regen < 4096:
            v = 1 | (1 << 2) | (regen << 4)
            return v.to_bytes(2, "little") + bytes([lits[0]])
        v = 1 | (3 << 2) | (regen << 4)
        return v.to_bytes(3, "little") + bytes([lits[0]])

    ltype = 2
    tree = b""
    ctable = max_bits = None
    if lit_mode == "treeless" and fstate_enc and "ctable" in fstate_enc \
            and distinct <= set(fstate_enc["ctable"]):
        ltype = 3
        ctable, max_bits = fstate_enc["ctable"], fstate_enc["max_bits"]
    else:
        freqs: dict[int, int] = {}
        for b in lits:
            freqs[b] = freqs.get(b, 0) + 1
        try:
            weights = _ze.huf_weights_from_lengths(_ze.huf_lengths(freqs))
            tree = _ze.huf_write_weights(weights)
            ctable, max_bits = _ze.huf_build_ctable(weights)
        except ValueError:
            return raw()

    def emit(ltype: int) -> bytes | None:
        if regen < 256:
            stream = _ze.huf_encode_stream(lits, ctable)
            csize = len(tree) + len(stream)
            if csize >= regen or csize > 0x3FF or regen > 0x3FF:
                return None
            v = ltype | (0 << 2) | (regen << 4) | (csize << 14)
            return v.to_bytes(3, "little") + tree + stream
        r123 = (regen + 3) // 4
        parts = [lits[0:r123], lits[r123:2 * r123],
                 lits[2 * r123:3 * r123], lits[3 * r123:]]
        streams = [_ze.huf_encode_stream(pt, ctable) for pt in parts]
        if any(len(st) > 0xFFFF for st in streams[:3]):
            return None
        jump = b"".join(len(st).to_bytes(2, "little")
                        for st in streams[:3])
        csize = len(tree) + 6 + sum(len(st) for st in streams)
        if csize >= regen:
            return None
        if regen <= 0x3FF and csize <= 0x3FF:
            v = ltype | (1 << 2) | (regen << 4) | (csize << 14)
            hdr = v.to_bytes(3, "little")
        elif regen <= 0x3FFF and csize <= 0x3FFF:
            v = ltype | (2 << 2) | (regen << 4) | (csize << 18)
            hdr = v.to_bytes(4, "little")
        elif regen <= 0x3FFFF and csize <= 0x3FFFF:
            v = ltype | (3 << 2) | (regen << 4) | (csize << 22)
            hdr = v.to_bytes(5, "little")
        else:
            return None
        return hdr + tree + jump + b"".join(streams)

    out = emit(ltype)
    if out is None:
        return raw()
    if ltype == 2 and fstate_enc is not None:
        fstate_enc["ctable"], fstate_enc["max_bits"] = ctable, max_bits
    return out


def encode_zstd_compressed(blocks: list[tuple[bytes, list[tuple[int, int, int]]]],
                           checksum: bool = False,
                           seq_mode: str = "predefined",
                           lit_mode: str = "fresh",
                           dictionary=None) -> bytes:
    """One zstd frame of Compressed_Blocks. Each block is
    ``(literals, sequences)`` with sequences as (literals_length,
    RAW match offset, match_length >= 3) — offsets are converted to
    offset_values against the live 3-slot repeat history exactly as a
    real encoder would (so repeat codes are exercised). Single-segment
    frame, 4-byte FCS, no checksum — same framing as
    :func:`encode_zstd_raw`.

    RFC 8878 §3.1.1.2.2 caps every block's SIZE (and decoded size) at
    Block_Maximum_Size = min(Window_Size, 128 KiB); with single-segment
    framing the window is the total content, so a block whose encoded
    body outgrows that cap (literals-only blocks always do) is emitted
    as a Raw_Block instead — the same fallback a real encoder applies.
    A raw fallback installs no FSE/Huffman tables and leaves the repeat
    -offset history untouched, so the encoder state is snapshot-restored
    and the next block in ``repeat``/``treeless`` chains re-installs.

    ``dictionary`` (RFC 8878 §5) seeds the match window (offsets may
    reach into the dictionary content), the repeat-offset history, and —
    for structured dictionaries — the Huffman/FSE tables, so the FIRST
    block may already use Treeless literals (``lit_mode="treeless"``)
    and Repeat_Mode sequences (``seq_mode="repeat"``). Dictionary
    frames swap single-segment framing for a window descriptor that
    covers dictionary + content and carry a 4-byte Dictionary_ID."""
    dstate = _dict_state(dictionary)
    total_content = sum(len(lits) + sum(s[2] for s in seqs)
                        for lits, seqs in blocks)
    block_max = min(max(total_content, 1), 1 << 17)
    payloads: list[tuple[int, bytes]] = []      # (block_type, body)
    if dstate is not None:
        reps = list(dstate["reps"])
        enc_seq_state = dstate["seq"]
        enc_lit_state = {}
        if dstate["ctable"] is not None:
            enc_lit_state = {"ctable": dstate["ctable"],
                             "max_bits": dstate["max_bits"]}
        first_seq_block = enc_seq_state.ll is None
        first_lit_block = not enc_lit_state
        window = bytearray(dstate["content"])
    else:
        reps = [1, 4, 8]
        enc_seq_state = _ze._SeqTables()
        enc_lit_state = {}
        first_seq_block = True
        first_lit_block = True
        window = bytearray()
    for lits, seqs in blocks:
        lit_used = sum(s[0] for s in seqs)
        if lit_used > len(lits):
            raise ValueError("zstd: plan literals overrun")
        blk_start = len(window)
        snap_reps = list(reps)
        snap_seq = (enc_seq_state.ll, enc_seq_state.of, enc_seq_state.ml,
                    enc_seq_state.ll_rle, enc_seq_state.of_rle,
                    enc_seq_state.ml_rle)
        snap_lit = dict(enc_lit_state)
        p = 0
        triples = []
        for ll, off, ml in seqs:
            window += lits[p:p + ll]
            p += ll
            if not 1 <= off <= len(window):
                raise ValueError("zstd: match offset outside the window")
            for _ in range(ml):
                window.append(window[-off])
            ov = _ze.offset_value_for(off, ll, reps)
            _, reps = _ze.apply_offset_history(ov, ll, reps)
            triples.append((ll, ov, ml))
        window += lits[p:]
        blk_content = bytes(window[blk_start:])
        if len(blk_content) > block_max:
            raise ValueError("zstd: block content over Block_Maximum_Size")
        if seq_mode == "repeat":
            # first sequence-carrying block installs tables (predefined),
            # later ones reuse them via Repeat_Mode (decoder mode 3)
            m = "predefined" if first_seq_block else "repeat"
        else:
            m = seq_mode
        lm = "fresh" if lit_mode == "fresh" or first_lit_block \
            else "treeless"
        body = _build_literals_section(lits, enc_lit_state, lm) \
            + _ze.encode_sequences(triples, enc_seq_state, mode=m)
        if len(body) > block_max:
            # Raw_Block fallback: restore the state the decoder will
            # actually be in (no tables installed, repeats unchanged)
            reps = snap_reps
            (enc_seq_state.ll, enc_seq_state.of, enc_seq_state.ml,
             enc_seq_state.ll_rle, enc_seq_state.of_rle,
             enc_seq_state.ml_rle) = snap_seq
            enc_lit_state.clear()
            enc_lit_state.update(snap_lit)
            payloads.append((0, blk_content))
            continue
        if len(set(lits)) > 1:
            first_lit_block = False
        if seqs:
            first_seq_block = False
        payloads.append((2, body))
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    if dstate is not None:
        # window descriptor (exponent-only) covering dict + content,
        # 4-byte Dictionary_ID, 4-byte FCS
        need = len(dstate["content"]) + total_content
        exp = 0
        while (1 << (10 + exp)) < need:
            exp += 1
            if exp > 21:
                raise ValueError("zstd: dictionary frame over 2 GiB "
                                 "window")
        out.append((2 << 6) | (4 if checksum else 0) | 3)
        out.append(exp << 3)
        out += int(dstate["dict_id"]).to_bytes(4, "little")
    else:
        out.append((2 << 6) | (1 << 5) | (4 if checksum else 0))
    out += total_content.to_bytes(4, "little")
    for i, (btype, body) in enumerate(payloads):
        last = 1 if i == len(payloads) - 1 else 0
        if len(body) >= 1 << 21:
            raise ValueError("zstd: block too large")
        out += (last | (btype << 1) | (len(body) << 3)).to_bytes(3, "little")
        out += body
    if checksum:
        skip = len(dstate["content"]) if dstate is not None else 0
        out += (_ze.xxh64(bytes(window[skip:]))
                & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def decode_zstd_frame(payload: bytes, dictionary=None) -> dict:
    """Walk one zstd frame: parse the header, decode every Raw/RLE
    block, verify the reassembled size against the frame-content-size
    field. Returns content plus per-type block counts and the total
    frame length. ``dictionary`` (raw bytes, encode_zstd_dictionary
    blob, or parse_zstd_dictionary dict) seeds the match window,
    entropy tables and repeat offsets per RFC 8878 §5; a frame whose
    Dictionary_ID names a dictionary that wasn't provided (or names a
    different one) refuses instead of misdecoding. A RAW-CONTENT
    dictionary (parsed dict_id 0 — no header, window seed only)
    deliberately matches any frame Dictionary_ID, the same contract
    as libzstd's ZSTD_decompress_usingDict with a raw dict; callers
    that synthesize raw dictionaries from untrusted bytes must gate
    on their own framing first (the WarcReader skippable-frame peel
    does exactly that since r11)."""
    dstate = _dict_state(dictionary)
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
        frame_did = int.from_bytes(payload[pos:pos + did_size], "little")
        if frame_did:
            if dstate is None:
                raise UnsupportedZstd(
                    "dictionary-compressed frame: pass the dictionary "
                    f"(frame names Dictionary_ID {frame_did})")
            if dstate["dict_id"] not in (0, frame_did):
                raise ValueError(
                    "zstd: frame Dictionary_ID "
                    f"{frame_did} != dictionary {dstate['dict_id']}")
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

    if dstate is not None:
        content = bytearray(dstate["content"])
        fstate = {"huf": dstate["huf"], "seq": dstate["seq"],
                  "reps": list(dstate["reps"])}
    else:
        content = bytearray()
        fstate = {"huf": None, "seq": _ze._SeqTables(), "reps": [1, 4, 8]}
    base = len(content)
    n_raw = n_rle = n_compressed = 0
    n_seq = lit_len = match_len = 0
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
            content += bytes(payload[pos:pos + 1]) * bsize
            pos += 1
            n_rle += 1
        elif btype == 2:
            if pos + bsize > len(payload):
                raise ValueError("zstd: truncated compressed block")
            info = _decode_compressed_block(
                payload[pos:pos + bsize], content, fstate)
            pos += bsize
            n_compressed += 1
            n_seq += info["n_seq"]
            lit_len += info["lit_len"]
            match_len += info["match_len"]
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    content = content[base:] if base else content
    if has_checksum:
        if pos + 4 > len(payload):
            raise ValueError("zstd: truncated content checksum")
        want = int.from_bytes(payload[pos:pos + 4], "little")
        got = _ze.xxh64(bytes(content)) & 0xFFFFFFFF
        if got != want:
            raise ValueError("zstd: content checksum mismatch")
        pos += 4
    if fcs is not None and len(content) != fcs:
        raise ValueError("zstd: content size mismatch vs FCS")
    return {"content": bytes(content), "content_len": len(content),
            "n_raw": n_raw, "n_rle": n_rle, "n_compressed": n_compressed,
            "n_blocks": n_raw + n_rle + n_compressed, "fcs": fcs,
            "n_seq": n_seq, "lit_len": lit_len, "match_len": match_len,
            "single_segment": single_segment, "window_log": window_log,
            "frame_bytes": pos}


# ---------------------------------------------------------------------------
# Stream layer: real .zst FILES are sequences of frames — zstd frames
# interleaved with SKIPPABLE frames (magic 0x184D2A50..5F + u32 size;
# RFC 8878 §3.1.2), which crawl tooling uses for index/dictionary side
# data. decode_zstd_stream walks them all.
# ---------------------------------------------------------------------------

_SKIP_MAGIC_LO = 0x184D2A50
_SKIP_MAGIC_HI = 0x184D2A5F


def encode_zstd_skippable(data: bytes, nibble: int = 0) -> bytes:
    """One skippable frame (magic 0x184D2A5<nibble>, u32 size, raw
    user data)."""
    if not 0 <= nibble <= 0xF:
        raise ValueError("zstd: skippable magic nibble out of range")
    return (_SKIP_MAGIC_LO + nibble).to_bytes(4, "little") \
        + len(data).to_bytes(4, "little") + data


def decode_zstd_stream(payload: bytes, dictionary=None) -> dict:
    """Walk a whole .zst stream: every data frame is fully decoded
    (Raw/RLE/Compressed blocks, checksum verified when present),
    skippable frames are framed-and-skipped with their payloads
    surfaced. Returns concatenated content plus per-frame summaries.
    ``dictionary`` applies to every dictionary-referencing data frame
    (parsed once up front)."""
    dstate = _dict_state(dictionary)
    pos = 0
    content = bytearray()
    frames = []
    skippable = []
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("zstd: truncated frame magic")
        magic = int.from_bytes(payload[pos:pos + 4], "little")
        if _SKIP_MAGIC_LO <= magic <= _SKIP_MAGIC_HI:
            if pos + 8 > len(payload):
                raise ValueError("zstd: truncated skippable header")
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if pos + 8 + size > len(payload):
                raise ValueError("zstd: truncated skippable frame")
            skippable.append(payload[pos + 8:pos + 8 + size])
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ValueError("zstd: bad magic number")
        # memoryview slice: O(1) per frame — a many-frame WET stream
        # must not pay a quadratic re-copy of the tail. dstate is
        # passed pre-parsed; _dict_state rebuilds the mutable FSE
        # table state fresh for every frame.
        f = decode_zstd_frame(memoryview(payload)[pos:], dictionary=dstate)
        content += f["content"]
        frames.append({k: f[k] for k in
                       ("content_len", "n_blocks", "n_raw", "n_rle",
                        "n_compressed", "frame_bytes")})
        pos += f["frame_bytes"]
    if not frames:
        raise ValueError("zstd: stream carries no data frames")
    return {"content": bytes(content), "content_len": len(content),
            "n_frames": len(frames), "n_skippable": len(skippable),
            "skippable_payloads": skippable, "frames": frames,
            "stream_bytes": pos}
