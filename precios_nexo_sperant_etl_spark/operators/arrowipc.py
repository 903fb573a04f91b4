"""From-scratch Arrow IPC stream reader (flatbuffers wire format too).

Parses the Apache Arrow IPC STREAMING format from the public spec
(Columnar.rst + Message.fbs/Schema.fbs): encapsulated messages
(continuation 0xFFFFFFFF + LE32 metadata length, 8-byte alignment),
the flatbuffers TABLES THEMSELVES decoded from the raw wire format
(vtables, field slots, unions, struct vectors — no ``flatbuffers``
runtime, the same from-scratch discipline as the parquet Thrift
footer), Schema/RecordBatch headers, validity bitmaps, and the
columnar buffer layouts for the flat types a tabular engine moves:
Int8-64 (signed/unsigned), Float32/64, Bool, Utf8/Binary (+ Large
variants), and FixedSizeBinary. The INDEPENDENT implementation pinned
against in ``tests/test_arrowipc.py`` is pyarrow itself — it writes
every test stream; our reader must reproduce ``to_pylist()`` exactly.

Refused loudly: dictionary-encoded fields, nested types, compressed
record batches (``compression`` present in the RecordBatch header) —
the supported surface is the flat landing-table shape, and silent
misreads are worse than errors.

The Arrow FILE format (ARROW1 magic + footer) is accepted by skipping
the magic and reading the embedded stream; the trailing footer is not
required for a full sequential read.
"""

from __future__ import annotations

import struct


class ArrowIpcError(ValueError):
    pass


# --- minimal flatbuffers wire decoding --------------------------------------

class _Tbl:
    """A flatbuffers table: resolve field slots via the vtable."""

    __slots__ = ("buf", "pos", "vt", "vt_len")

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        soff = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soff
        self.vt_len = struct.unpack_from("<H", buf, self.vt)[0]

    def _slot(self, field_id: int) -> int:
        """Byte position of the field's value, or 0 if absent."""
        voff = 4 + 2 * field_id
        if voff + 2 > self.vt_len:
            return 0
        rel = struct.unpack_from("<H", self.buf, self.vt + voff)[0]
        return self.pos + rel if rel else 0

    def i8(self, fid: int, default: int = 0) -> int:
        p = self._slot(fid)
        return self.buf[p] if p else default

    def i16(self, fid: int, default: int = 0) -> int:
        p = self._slot(fid)
        return struct.unpack_from("<h", self.buf, p)[0] if p else default

    def i32(self, fid: int, default: int = 0) -> int:
        p = self._slot(fid)
        return struct.unpack_from("<i", self.buf, p)[0] if p else default

    def i64(self, fid: int, default: int = 0) -> int:
        p = self._slot(fid)
        return struct.unpack_from("<q", self.buf, p)[0] if p else default

    def bool_(self, fid: int, default: bool = False) -> bool:
        p = self._slot(fid)
        return bool(self.buf[p]) if p else default

    def _indirect(self, p: int) -> int:
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def table(self, fid: int) -> "_Tbl | None":
        p = self._slot(fid)
        return _Tbl(self.buf, self._indirect(p)) if p else None

    def string(self, fid: int) -> str | None:
        p = self._slot(fid)
        if not p:
            return None
        sp = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, sp)[0]
        return self.buf[sp + 4:sp + 4 + n].decode("utf-8")

    def vector(self, fid: int) -> tuple[int, int]:
        """(element-0 position, length) of a vector field, or (0, 0)."""
        p = self._slot(fid)
        if not p:
            return 0, 0
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, vp)[0]
        return vp + 4, n

    def table_vector(self, fid: int) -> list["_Tbl"]:
        base, n = self.vector(fid)
        out = []
        for i in range(n):
            off = base + 4 * i
            out.append(_Tbl(self.buf,
                            off + struct.unpack_from("<I", self.buf,
                                                     off)[0]))
        return out


# --- Schema interpretation ---------------------------------------------------

# union Type tag order from Schema.fbs (NONE = 0)
_T_INT, _T_FLOAT, _T_BINARY, _T_UTF8, _T_BOOL = 2, 3, 4, 5, 6
_T_FIXEDBIN = 15
_T_LARGEBIN, _T_LARGEUTF8 = 19, 20


def _field_spec(f: _Tbl) -> dict:
    name = f.string(0) or ""
    tag = f.i8(2)
    t = f.table(3)
    if f.table(4) is not None:
        raise ArrowIpcError(f"field {name!r} is dictionary-encoded "
                            "(unsupported here)")
    if f.table_vector(5):
        raise ArrowIpcError(f"field {name!r} has children: nested "
                            "types are unsupported here")
    if tag == _T_INT:
        return {"name": name, "kind": "int",
                "bits": t.i32(0), "signed": t.bool_(1)}
    if tag == _T_FLOAT:
        prec = t.i16(0)          # SHORT enum: 0=half 1=single 2=double
        if prec == 0:
            raise ArrowIpcError("float16 unsupported")
        return {"name": name, "kind": "float", "bits": 32 * prec}
    if tag == _T_BOOL:
        return {"name": name, "kind": "bool"}
    if tag in (_T_UTF8, _T_LARGEUTF8):
        return {"name": name, "kind": "utf8",
                "offw": 8 if tag == _T_LARGEUTF8 else 4}
    if tag in (_T_BINARY, _T_LARGEBIN):
        return {"name": name, "kind": "binary",
                "offw": 8 if tag == _T_LARGEBIN else 4}
    if tag == _T_FIXEDBIN:
        return {"name": name, "kind": "fixedbin", "width": t.i32(0)}
    raise ArrowIpcError(f"field {name!r}: unsupported type tag {tag}")


# --- record batch decoding ---------------------------------------------------

def _valid(bitmap: bytes | None, i: int) -> bool:
    if bitmap is None:
        return True
    return bool(bitmap[i >> 3] & (1 << (i & 7)))


def _decode_column(spec: dict, n: int, null_count: int,
                   bufs: list[bytes]) -> list:
    validity = bufs[0] if null_count else None
    if spec["kind"] in ("int", "float"):
        data = bufs[1]
        fmt = {("int", 8, True): "b", ("int", 8, False): "B",
               ("int", 16, True): "h", ("int", 16, False): "H",
               ("int", 32, True): "i", ("int", 32, False): "I",
               ("int", 64, True): "q", ("int", 64, False): "Q",
               ("float", 32, None): "f", ("float", 64, None): "d"}[
            (spec["kind"], spec["bits"],
             spec.get("signed") if spec["kind"] == "int" else None)]
        vals = struct.unpack_from(f"<{n}{fmt}", data, 0) if n else ()
        return [v if _valid(validity, i) else None
                for i, v in enumerate(vals)]
    if spec["kind"] == "bool":
        data = bufs[1]
        return [bool(data[i >> 3] & (1 << (i & 7)))
                if _valid(validity, i) else None for i in range(n)]
    if spec["kind"] in ("utf8", "binary"):
        offs_raw, data = bufs[1], bufs[2]
        fmt = "q" if spec["offw"] == 8 else "i"
        offs = struct.unpack_from(f"<{n + 1}{fmt}", offs_raw, 0) \
            if n else (0,)
        out = []
        for i in range(n):
            if not _valid(validity, i):
                out.append(None)
                continue
            chunk = data[offs[i]:offs[i + 1]]
            out.append(chunk.decode("utf-8")
                       if spec["kind"] == "utf8" else bytes(chunk))
        return out
    if spec["kind"] == "fixedbin":
        data = bufs[1]
        w = spec["width"]
        return [bytes(data[i * w:(i + 1) * w])
                if _valid(validity, i) else None for i in range(n)]
    raise ArrowIpcError(f"unhandled kind {spec['kind']}")


def _n_buffers(spec: dict) -> int:
    return 3 if spec["kind"] in ("utf8", "binary") else 2


def read_arrow_stream(blob: bytes) -> dict:
    """Decode an IPC stream (or file): returns ``{"columns": [name...],
    "rows": [tuple...], "n_batches": int}``."""
    pos = 0
    if blob[:6] == b"ARROW1":            # file format: magic + pad
        pos = 8
    schema_specs: list[dict] | None = None
    columns: list[list] = []
    n_batches = 0
    while pos + 8 <= len(blob):
        (cont,) = struct.unpack_from("<I", blob, pos)
        if cont != 0xFFFFFFFF:
            if schema_specs is None:
                raise ArrowIpcError("stream does not start with an "
                                    "encapsulated message")
            break                        # file-format footer begins
        (meta_len,) = struct.unpack_from("<I", blob, pos + 4)
        pos += 8
        if meta_len == 0:                # end-of-stream marker
            break
        meta = blob[pos:pos + meta_len]
        pos += meta_len
        msg = _Tbl(meta, struct.unpack_from("<I", meta, 0)[0])
        header_type = msg.i8(1)
        body_len = msg.i64(3)
        body = blob[pos:pos + body_len]
        pos += body_len
        pos += (-pos) % 8
        if header_type == 1:             # Schema
            sch = msg.table(2)
            schema_specs = [_field_spec(f) for f in sch.table_vector(1)]
            columns = [[] for _ in schema_specs]
        elif header_type == 3:           # RecordBatch
            if schema_specs is None:
                raise ArrowIpcError("RecordBatch before Schema")
            rb = msg.table(2)
            if rb.table(3) is not None:
                raise ArrowIpcError("compressed record batches are "
                                    "unsupported here")
            n = rb.i64(0)
            nodes_base, n_nodes = rb.vector(1)
            bufs_base, n_bufs = rb.vector(2)
            nodes = [struct.unpack_from("<qq", meta,
                                        nodes_base + 16 * i)
                     for i in range(n_nodes)]
            buffers = [struct.unpack_from("<qq", meta,
                                          bufs_base + 16 * i)
                       for i in range(n_bufs)]
            bi = 0
            for ci, spec in enumerate(schema_specs):
                want = _n_buffers(spec)
                cb = []
                for _ in range(want):
                    off, ln = buffers[bi]
                    bi += 1
                    cb.append(body[off:off + ln])
                length, null_count = nodes[ci]
                if length != n:
                    raise ArrowIpcError("field node length mismatch")
                columns[ci] += _decode_column(spec, n, null_count, cb)
            if bi != n_bufs:
                raise ArrowIpcError(
                    f"buffer count mismatch: consumed {bi}, "
                    f"batch carries {n_bufs}")
            n_batches += 1
        elif header_type == 2:
            raise ArrowIpcError("dictionary batches are unsupported "
                                "here")
        else:
            raise ArrowIpcError(f"unknown message header type "
                                f"{header_type}")
    if schema_specs is None:
        raise ArrowIpcError("no Schema message found")
    names = [s["name"] for s in schema_specs]
    rows = list(zip(*columns)) if columns else []
    return {"columns": names, "rows": rows, "n_batches": n_batches}
