"""WebDataset-style tar shard handling — the canonical container for
large-scale multimodal training corpora (a tar of files where
``<key>.<ext>`` members with the same key form one training sample;
shards stream sequentially, which is what makes the format work at
100 TB: no random access, no index, just concatenated 512-byte blocks).

The walker is a from-scratch ustar parser (public POSIX.1-1988 layout):
512-byte headers with NUL/space-padded octal size fields, the
whole-header checksum (computed with the chksum field blanked to
spaces), 512-byte content alignment, and the two-zero-block terminator.
GNU/pax extensions (long names, sparse members) raise cleanly — the
WebDataset convention keeps member names short, and a silent fallback
would mis-key samples. Writing shards goes through stdlib ``tarfile``
with pinned uid/gid/mtime so shard bytes are deterministic; parsing
deliberately does NOT use ``tarfile`` so the byte-level walk is our
own tested surface (same discipline as the xlsx/BIFF readers,
``sources/excel.py``).

Spark shape: shard assembly is a ``groupBy(shard).applyInPandas`` —
one shuffle keyed by shard id, each task writing one self-contained
tar (exactly how real shard writers lay out output); sample extraction
back out is a narrow ``mapInPandas`` over shard payloads. Shard size
(rows per shard) is the partition-sizing knob; payload bytes dominate,
so the multimodal partition-sizing note applies.
"""

from __future__ import annotations

import io
import tarfile

__all__ = ["parse_tar_members", "group_samples", "build_shard"]


def _octal(field: bytes) -> int:
    """Parse a NUL/space-terminated octal header field. Base-256
    (binary) size encoding — high bit set — is a GNU extension for
    >8 GiB members; out of scope, raise."""
    if field and field[0] & 0x80:
        raise ValueError("base-256 tar size fields are not supported")
    s = field.rstrip(b"\x00 ").lstrip(b" ")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"bad octal tar field {field!r}") from exc


def parse_tar_members(payload: bytes) -> list[dict]:
    """Walk a ustar stream and return its regular members as
    ``{"name", "size", "offset", "data"}`` dicts in file order.

    Verifies every header checksum (sum of header bytes with the
    chksum field taken as 8 spaces — both the signed and unsigned
    historical variants are accepted, like real tar readers).
    Directories are skipped; link/char/block/FIFO types and GNU/pax
    special members ('L', 'x', 'g', 'S') raise ``ValueError`` —
    mis-keying a training sample is worse than failing the shard.
    """
    members = []
    pos = 0
    n = len(payload)
    terminated = False
    while pos + 512 <= n:
        hdr = payload[pos:pos + 512]
        if hdr == b"\x00" * 512:
            # terminator: two zero blocks end the archive; tolerate one
            terminated = True
            break
        name = hdr[0:100].rstrip(b"\x00").decode("utf-8", "strict")
        size = _octal(hdr[124:136])
        stored = _octal(hdr[148:156])
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        unsigned = sum(blanked)
        signed = sum(b - 256 if b >= 128 else b for b in blanked)
        if stored not in (unsigned, signed):
            raise ValueError(f"tar header checksum mismatch at {pos}")
        typeflag = hdr[156:157]
        data_start = pos + 512
        data_end = data_start + size
        if data_end > n:
            raise ValueError(f"tar member {name!r} overruns the stream")
        if typeflag in (b"0", b"\x00"):
            members.append({"name": name, "size": size,
                            "offset": data_start,
                            "data": payload[data_start:data_end]})
        elif typeflag == b"5":
            pass                                   # directory: skip
        else:
            raise ValueError(
                f"unsupported tar member type {typeflag!r} ({name!r})")
        pos = data_start + (size + 511) // 512 * 512
    if not terminated:
        # a shard that just stops mid-stream lost its tail in transit;
        # returning the partial member list would silently drop samples
        raise ValueError("truncated tar stream (no zero-block terminator)")
    return members


def group_samples(members: list[dict]) -> dict[str, dict[str, bytes]]:
    """WebDataset sample grouping: the key is the member name up to the
    FIRST dot (so ``000123.seg.png`` and ``000123.txt`` share key
    ``000123``); everything after it is the extension label. Returns
    ``{key: {ext: data}}`` preserving first-seen key order (samples are
    contiguous in well-formed shards, but grouping tolerates
    interleave). Duplicate (key, ext) pairs raise — a duplicated
    member silently overwriting a sample part is shard corruption."""
    out: dict[str, dict[str, bytes]] = {}
    for m in members:
        base = m["name"].rsplit("/", 1)[-1]
        key, dot, ext = base.partition(".")
        if not dot:
            raise ValueError(f"member {m['name']!r} has no extension")
        bucket = out.setdefault(key, {})
        if ext in bucket:
            raise ValueError(f"duplicate member {m['name']!r} in shard")
        bucket[ext] = m["data"]
    return out


def build_shard(parts: list[tuple[str, bytes]]) -> bytes:
    """Write a deterministic ustar shard: members in the given order,
    uid/gid/mtime pinned to zero, no user/group names — the same bytes
    on every executor and every run, so shard payloads are safe inside
    value-hashed results."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in parts:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


# --- WARC (ISO 28500) record stream ------------------------------------------

def parse_warc_records(payload: bytes) -> list[dict]:
    """REAL WARC/1.0 record walk (public ISO 28500 framing): each
    record is a ``WARC/1.0\\r\\n`` version line, ``Name: value`` header
    lines up to a blank line, exactly ``Content-Length`` payload
    octets, then the mandatory ``\\r\\n\\r\\n`` record separator.
    Gzip-wrapped streams (the Common Crawl convention) are inflated
    first via the verified gzip seam. Returns ``{"type", "record_id",
    "content_length", "payload"}`` dicts in stream order; raises
    ``ValueError`` on version/framing/length violations — a mis-framed
    WARC silently truncates a crawl, so no warn-and-continue here.
    """
    from .multimodal import decode_gzip
    if payload[:2] == b"\x1f\x8b":
        payload = decode_gzip(payload)
    records = []
    pos = 0
    n = len(payload)
    while pos < n:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("unterminated WARC version line")
        version = payload[pos:eol]
        if version != b"WARC/1.0":
            raise ValueError(f"bad WARC version line {version!r}")
        hdr_end = payload.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        headers = {}
        for line in payload[eol + 2:hdr_end].split(b"\r\n"):
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid WARC Content-Length") from None
        body = hdr_end + 4
        if body + clen + 4 > n:
            raise ValueError("WARC record overruns the stream")
        if payload[body + clen:body + clen + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        records.append({
            "type": headers.get(b"warc-type", b"").decode("latin-1"),
            "record_id": headers.get(b"warc-record-id",
                                     b"").decode("latin-1"),
            "content_length": clen,
            "payload": payload[body:body + clen],
        })
        pos = body + clen + 4
    return records


def build_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize ``(warc_type, record_id, payload)`` triples into a
    spec-shaped WARC/1.0 stream (deterministic: no dates, fixed header
    order) — the test/oracle-side twin of :func:`parse_warc_records`,
    same posture as ``build_shard``."""
    out = bytearray()
    for wtype, rid, payload in records:
        out += (b"WARC/1.0\r\n"
                + b"WARC-Type: " + wtype.encode() + b"\r\n"
                + b"WARC-Record-ID: " + rid.encode() + b"\r\n"
                + b"Content-Length: " + str(len(payload)).encode()
                + b"\r\n\r\n" + payload + b"\r\n\r\n")
    return bytes(out)
