"""ZIP container codec: interop pins against the INDEPENDENT stdlib
``zipfile`` (zlib-backed) in both directions, plus container-format
edge cases — data-descriptor streams, forced ZIP64, archive comments,
UTF-8 vs CP437 names, stored members, corruption detection."""

import io
import random
import zipfile

import pytest

from precios_nexo_sperant_etl_spark.operators.ziparchive import (
    ZipError, zip_create, zip_extract, zip_list)


class _NoSeek(io.RawIOBase):
    """Non-seekable sink: forces stdlib zipfile onto the
    data-descriptor path (general-purpose bit 3, zero sizes in the
    local header)."""

    def __init__(self):
        self.b = bytearray()

    def writable(self):
        return True

    def write(self, d):
        self.b += d
        return len(d)


def test_stdlib_writes_ours_reads_deflate_and_stored():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", b"hello world " * 200)
        zf.writestr("dir/b.bin", bytes(range(256)) * 20)
        zf.writestr("stored.txt", b"tiny",
                    compress_type=zipfile.ZIP_STORED)
    members = zip_extract(buf.getvalue())
    assert [m["name"] for m in members] == ["a.txt", "dir/b.bin",
                                            "stored.txt"]
    assert all(m["crc_ok"] for m in members)
    assert members[0]["data"] == b"hello world " * 200
    assert members[1]["data"] == bytes(range(256)) * 20
    assert members[2]["method"] == 0


def test_ours_writes_stdlib_reads_and_testzips():
    rng = random.Random(3)
    entries = [("x.txt", b"compress me " * 500),
               ("raw.bin", bytes(rng.randrange(256) for _ in range(400))),
               ("n/ested/deep.txt", b"nested payload")]
    blob = zip_create(entries)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None         # stdlib verifies every CRC
    for name, data in entries:
        assert zf.read(name) == data


def test_unicode_names_both_directions():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("está/ñame.txt", "acentos y eñes".encode())
    m = zip_extract(buf.getvalue())
    assert m[0]["name"] == "está/ñame.txt"
    assert m[0]["data"].decode() == "acentos y eñes"

    blob = zip_create([("ñandú.txt", "ütf-8 name".encode())])
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.read("ñandú.txt").decode() == "ütf-8 name"


def test_data_descriptor_stream():
    ns = _NoSeek()
    with zipfile.ZipFile(ns, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("s1.txt", b"streamed " * 50)
        zf.writestr("s2.txt", b"more streamed data")
    members = zip_extract(bytes(ns.b))
    assert [m["name"] for m in members] == ["s1.txt", "s2.txt"]
    assert members[0]["data"] == b"streamed " * 50
    assert all(m["crc_ok"] for m in members)


def test_forced_zip64_members():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        with zf.open("big.txt", "w", force_zip64=True) as f:
            f.write(b"zip64 payload " * 1000)
    m = zip_extract(buf.getvalue())
    assert m[0]["data"] == b"zip64 payload " * 1000
    assert m[0]["crc_ok"]


def test_archive_comment_eocd_scan():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("c.txt", b"with comment")
        zf.comment = b"trailing archive comment " * 10
    m = zip_extract(buf.getvalue())
    assert m[0]["data"] == b"with comment"


def test_incompressible_falls_back_to_stored():
    rng = random.Random(9)
    noise = bytes(rng.randrange(256) for _ in range(5000))
    blob = zip_create([("noise.bin", noise)])
    assert zip_list(blob)[0]["method"] == 0
    assert zipfile.ZipFile(io.BytesIO(blob)).read("noise.bin") == noise


def test_corrupted_payload_flagged_by_crc():
    blob = bytearray(zip_create([("p.txt", b"protect me " * 100)],
                                method="stored"))
    # flip a payload byte inside the stored member, past the header
    blob[40] ^= 0xFF
    m = zip_extract(bytes(blob))
    assert not m[0]["crc_ok"]


def test_garbage_rejected():
    with pytest.raises(ZipError):
        zip_extract(b"not a zip file at all")
    with pytest.raises(ZipError):
        zip_extract(b"PK\x05\x06" + b"\x00" * 10)   # truncated EOCD


def test_roundtrip_many_members_property():
    rng = random.Random(4)
    entries = [(f"doc_{i:03d}.txt",
                bytes(rng.choice(b"zip property test \n")
                      for _ in range(rng.randrange(0, 2000))))
               for i in range(40)]
    blob = zip_create(entries)
    members = zip_extract(blob)
    assert [(m["name"], m["data"]) for m in members] == entries
    assert all(m["crc_ok"] for m in members)
    # and stdlib agrees on the same blob
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    assert [zf.read(n) for n, _ in entries] == [d for _, d in entries]
