"""From-scratch Parquet footer parser (Thrift compact protocol).

Parses the ``FileMetaData`` structure every parquet file carries in its
tail — schema elements, row groups, column-chunk metadata and min/max/
null-count statistics — implementing the public Apache Thrift compact
protocol wire format and the Apache parquet-format IDL field numbering
from scratch (no ``pyarrow``/thrift import in this module; pyarrow and
DuckDB's parquet reader are the INDEPENDENT implementations the tests
and the driver oracle pin against).

This is the 100 TB pruning primitive: a planner that can read ONLY the
footer (a seek to the last 8 bytes, then one bounded read) can skip
row groups whose [min, max] ranges exclude a predicate — the engine's
analog of partition pruning at the file level. The driver-checked query
``parquet_footer_stats`` proves the parse end-to-end by comparing the
footer's own statistics against DuckDB *recomputing the same numbers
from the data* — the strongest possible independence: the stats were
written by parquet-cpp, decoded by this parser, and cross-checked
against a full scan by a third implementation.

Reference parity context: the reference ETL's only storage format is
.xlsx (Actualizar_Precios_de_Nexo.py:33-45); parquet is this engine's
native lake format, so its metadata layer is first-class here.

Wire format notes (thrift compact protocol spec):
- field header: one byte ``(id_delta << 4) | type``; delta 0 means the
  field id follows as a zigzag varint; type 0 terminates the struct;
- ints are zigzag varints; doubles are 8 bytes little-endian;
- binary: varint length + bytes; list/set: ``(size << 4) | elem_type``
  with size 15 escaping to a varint; map: varint size + one type byte;
- BOOLEAN_TRUE/FALSE are encoded in the field-header type itself
  (1/2); inside lists a bool element is one byte.
"""

from __future__ import annotations

import struct

PHYSICAL_TYPES = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
                  4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
                  7: "FIXED_LEN_BYTE_ARRAY"}
CODECS = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
          4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}
REPETITIONS = {0: "REQUIRED", 1: "OPTIONAL", 2: "REPEATED"}


class ParquetMetaError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Thrift compact protocol
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ParquetMetaError("runaway varint")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise ParquetMetaError("truncated binary")
        self.pos += n
        return out

    def double(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.pos)
        self.pos += 8
        return v


def _read_value(r: _Reader, ftype: int):
    if ftype == 1:
        return True
    if ftype == 2:
        return False
    if ftype == 3:                      # i8
        return r.zigzag()
    if ftype in (4, 5, 6):              # i16/i32/i64
        return r.zigzag()
    if ftype == 7:
        return r.double()
    if ftype == 8:
        return r.binary()
    if ftype in (9, 10):                # list/set
        head = r.byte()
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size = r.varint()
        if etype == 1:                  # bool elements: one byte each
            return [r.byte() == 1 for _ in range(size)]
        return [_read_value(r, etype) for _ in range(size)]
    if ftype == 11:                     # map
        size = r.varint()
        if size == 0:
            return {}
        tb = r.byte()
        kt, vt = tb >> 4, tb & 0x0F
        return {_read_value(r, kt): _read_value(r, vt)
                for _ in range(size)}
    if ftype == 12:
        return _read_struct(r)
    raise ParquetMetaError(f"unknown thrift compact type {ftype}")


def _read_struct(r: _Reader) -> dict[int, object]:
    """Generic struct: {field_id: value}. Unknown fields are kept (the
    parquet IDL interpretation below picks what it knows)."""
    out: dict[int, object] = {}
    fid = 0
    while True:
        head = r.byte()
        if head == 0:
            return out
        delta = head >> 4
        ftype = head & 0x0F
        fid = fid + delta if delta else r.zigzag()
        out[fid] = _read_value(r, ftype)


# ---------------------------------------------------------------------------
# parquet-format IDL interpretation
# ---------------------------------------------------------------------------

def _utf8(v) -> str:
    return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else str(v)


def decode_stat_value(raw: bytes | None, physical_type: str):
    """Decode a Statistics min/max value for the plain-encoded physical
    types (the spec stores them as the column's plain encoding)."""
    if raw is None:
        return None
    if physical_type == "INT32":
        return struct.unpack("<i", raw)[0]
    if physical_type == "INT64":
        return struct.unpack("<q", raw)[0]
    if physical_type == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if physical_type == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if physical_type == "BOOLEAN":
        return raw != b"\x00"
    return bytes(raw)                   # BYTE_ARRAY / FIXED: raw bytes


def _statistics(d: dict | None, physical_type: str) -> dict:
    if not d:
        return {"min": None, "max": None, "null_count": None,
                "distinct_count": None}
    # prefer the order-defined min_value/max_value (fields 5/6) over the
    # deprecated min/max (2/1)
    min_raw = d.get(6, d.get(2))
    max_raw = d.get(5, d.get(1))
    return {
        "min": decode_stat_value(min_raw, physical_type),
        "max": decode_stat_value(max_raw, physical_type),
        "null_count": d.get(3),
        "distinct_count": d.get(4),
    }


def _column_chunk(d: dict) -> dict:
    md = d.get(3)
    if md is None:
        raise ParquetMetaError("column chunk without metadata")
    ptype = PHYSICAL_TYPES.get(md.get(1), f"UNKNOWN({md.get(1)})")
    return {
        "path": ".".join(_utf8(p) for p in md.get(3, [])),
        "physical_type": ptype,
        "codec": CODECS.get(md.get(4), f"UNKNOWN({md.get(4)})"),
        "num_values": md.get(5),
        "total_uncompressed_size": md.get(6),
        "total_compressed_size": md.get(7),
        "data_page_offset": md.get(9),
        "dictionary_page_offset": md.get(11),
        "encodings": md.get(2, []),
        "statistics": _statistics(md.get(12), ptype),
    }


def parse_footer(tail: bytes) -> dict:
    """Parse a parquet footer from the file's trailing bytes. ``tail``
    must include at least the whole footer + the final 8 bytes
    (``len`` LE32 + ``PAR1``); pass the entire file or a bounded tail
    read — footers are KBs even on TB-scale files."""
    if len(tail) < 12 or tail[-4:] != b"PAR1":
        raise ParquetMetaError("missing PAR1 trailer magic")
    (flen,) = struct.unpack("<I", tail[-8:-4])
    if flen + 8 > len(tail):
        raise ParquetMetaError(
            f"footer is {flen} bytes but only {len(tail) - 8} supplied")
    r = _Reader(tail, len(tail) - 8 - flen)
    fmd = _read_struct(r)
    schema = []
    for el in fmd.get(2, []):
        schema.append({
            "name": _utf8(el.get(4, b"")),
            "physical_type": PHYSICAL_TYPES.get(el.get(1))
            if 1 in el else None,
            "repetition": REPETITIONS.get(el.get(3)) if 3 in el else None,
            "num_children": el.get(5),
        })
    row_groups = []
    for rg in fmd.get(4, []):
        row_groups.append({
            "num_rows": rg.get(3),
            "total_byte_size": rg.get(2),
            "columns": [_column_chunk(c) for c in rg.get(1, [])],
        })
    return {
        "version": fmd.get(1),
        "num_rows": fmd.get(3),
        "created_by": _utf8(fmd.get(6, b"")),
        "schema": schema,
        "row_groups": row_groups,
        "key_value_metadata": {
            _utf8(kv.get(1, b"")): (_utf8(kv[2]) if kv.get(2) is not None
                                    else None)
            for kv in fmd.get(5, [])},
    }


def read_footer(path: str, tail_bytes: int = 1 << 20) -> dict:
    """Footer-only read: seek to the end, read a bounded tail (1 MiB
    default — grown automatically if the footer is larger), parse. On
    a 100 TB lake this touches kilobytes per file."""
    import os
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(max(0, size - 8))
        trailer = f.read(8)
        if len(trailer) != 8 or trailer[4:] != b"PAR1":
            raise ParquetMetaError(f"not a parquet file: {path}")
        (flen,) = struct.unpack("<I", trailer[:4])
        need = min(size, flen + 8)
        f.seek(size - need)
        return parse_footer(f.read(need))
