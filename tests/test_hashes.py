"""From-scratch MD5/SHA-256 pinned against hashlib (OpenSSL) and the
published RFC/FIPS vectors, plus DuckDB's md5 as a third opinion."""

import hashlib
import random

import duckdb

from precios_nexo_sperant_etl_spark.functions.hashes import (
    md5_hex, sha256_hex)


def test_rfc1321_vectors():
    assert md5_hex(b"") == "d41d8cd98f00b204e9800998ecf8427e"
    assert md5_hex(b"a") == "0cc175b9c0f1b6a831c399e269772661"
    assert md5_hex(b"abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert md5_hex(b"message digest") \
        == "f96b697d7cb7938d525a2f31aaf161d0"


def test_fips_sha256_vectors():
    assert sha256_hex(b"") == ("e3b0c44298fc1c149afbf4c8996fb924"
                               "27ae41e4649b934ca495991b7852b855")
    assert sha256_hex(b"abc") == ("ba7816bf8f01cfea414140de5dae2223"
                                  "b00361a396177a9cb410ff61f20015ad")


def test_random_pin_against_hashlib():
    rng = random.Random(29)
    for _ in range(200):
        d = bytes(rng.randrange(256)
                  for _ in range(rng.randrange(0, 300)))
        assert md5_hex(d) == hashlib.md5(d).hexdigest()
        assert sha256_hex(d) == hashlib.sha256(d).hexdigest()
    # block/pad boundary lengths
    base = bytes(range(256))
    for n in (0, 55, 56, 57, 63, 64, 65, 119, 120, 127, 128, 129):
        assert md5_hex(base[:n]) == hashlib.md5(base[:n]).hexdigest()
        assert sha256_hex(base[:n]) \
            == hashlib.sha256(base[:n]).hexdigest()


def test_duckdb_third_opinion():
    con = duckdb.connect()
    for s in ("", "hola", "texto con eñes y acentós", "x" * 1000):
        assert md5_hex(s.encode()) == con.execute(
            "select md5(?)", [s]).fetchone()[0]
