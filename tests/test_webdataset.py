"""Unit tests for the from-scratch WebDataset tar walker
(operators/webdataset.py) — pure bytes, no Spark session."""

from __future__ import annotations

import io
import tarfile

import pytest

from precios_nexo_sperant_etl_spark.operators.webdataset import (
    build_shard, group_samples, parse_tar_members)


def test_roundtrip_and_determinism():
    parts = [("000001.txt", b"hello world"), ("000001.cls", b"en"),
             ("000002.txt", b"bonjour"), ("000002.cls", b"fr")]
    shard = build_shard(parts)
    assert shard == build_shard(parts)  # pinned metadata → same bytes
    ms = parse_tar_members(shard)
    assert [(m["name"], m["size"]) for m in ms] == [
        ("000001.txt", 11), ("000001.cls", 2),
        ("000002.txt", 7), ("000002.cls", 2)]
    s = group_samples(ms)
    assert s["000001"]["txt"] == b"hello world"
    assert s["000002"]["cls"] == b"fr"


def test_walker_agrees_with_stdlib_tarfile():
    parts = [(f"{i:06d}.bin", bytes(range(i % 251)) * 3)
             for i in range(1, 20)]
    shard = build_shard(parts)
    ours = {m["name"]: m["data"] for m in parse_tar_members(shard)}
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        theirs = {ti.name: tf.extractfile(ti).read()
                  for ti in tf.getmembers()}
    assert ours == theirs


def test_sample_keying_first_dot_and_paths():
    shard = build_shard([("a/b/x1.seg.png", b"\x01\x02"),
                         ("a/b/x1.txt", b"t")])
    g = group_samples(parse_tar_members(shard))
    assert g["x1"]["seg.png"] == b"\x01\x02" and g["x1"]["txt"] == b"t"


def test_corruption_taxonomy():
    shard = build_shard([("k.txt", b"abc")])
    bad = bytearray(shard)
    bad[150] ^= 0x01                       # flip a checksum digit
    with pytest.raises(ValueError):
        parse_tar_members(bytes(bad))
    with pytest.raises(ValueError):        # lost tail: no terminator
        parse_tar_members(shard[:600])
    with pytest.raises(ValueError):        # duplicate (key, ext)
        group_samples(parse_tar_members(
            build_shard([("k.txt", b"a"), ("k.txt", b"b")])))
    with pytest.raises(ValueError):        # extension-less member
        group_samples(parse_tar_members(build_shard([("k", b"a")])))


def test_directories_skipped_and_special_types_raise():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo(name="dir/")
        d.type = tarfile.DIRTYPE
        d.mtime = d.uid = d.gid = 0
        tf.addfile(d)
        f = tarfile.TarInfo(name="dir/s.txt")
        f.size = 2
        f.mtime = f.uid = f.gid = 0
        tf.addfile(f, io.BytesIO(b"ok"))
    ms = parse_tar_members(buf.getvalue())
    assert [m["name"] for m in ms] == ["dir/s.txt"]

    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        ln = tarfile.TarInfo(name="link")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "k.txt"
        ln.mtime = ln.uid = ln.gid = 0
        tf.addfile(ln)
    with pytest.raises(ValueError):
        parse_tar_members(buf2.getvalue())


# --- WARC records ------------------------------------------------------------

def test_warc_roundtrip_plain_and_gzip():
    import gzip
    from precios_nexo_sperant_etl_spark.operators.webdataset import (
        build_warc, parse_warc_records)
    w = build_warc([("warcinfo", "<urn:uuid:1>", b"software: test"),
                    ("response", "<urn:uuid:2>", b"hello crawl body")])
    rs = parse_warc_records(w)
    assert [r["type"] for r in rs] == ["warcinfo", "response"]
    assert rs[1]["payload"] == b"hello crawl body"
    assert rs[1]["record_id"] == "<urn:uuid:2>"
    assert parse_warc_records(gzip.compress(w)) == rs


def test_warc_framing_taxonomy():
    from precios_nexo_sperant_etl_spark.operators.webdataset import (
        build_warc, parse_warc_records)
    w = build_warc([("response", "<urn:uuid:9>", b"abcdef")])
    for bad in (w[:-4],                                       # lost tail
                w.replace(b"WARC/1.0", b"WARC/9.9", 1),      # version
                w.replace(b"Content-Length: 6",
                          b"Content-Length: xx", 1),          # length
                w.replace(b"Content-Length", b"X-NoColonLine"
                          b"NoSep", 1)[:len(w)]):             # malformed
        with pytest.raises(ValueError):
            parse_warc_records(bad)
    # payload bytes containing \r\n\r\n must not confuse the framing
    tricky = build_warc([("response", "<a>", b"x\r\n\r\ny"),
                         ("response", "<b>", b"tail")])
    rs = parse_warc_records(tricky)
    assert rs[0]["payload"] == b"x\r\n\r\ny"
    assert rs[1]["payload"] == b"tail"
