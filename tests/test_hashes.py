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


def test_hmac_sha256_rfc4231_vectors():
    from precios_nexo_sperant_etl_spark.functions.hashes import (
        hmac_sha256)
    # RFC 4231 test case 1 and 2
    assert hmac_sha256(b"\x0b" * 20, b"Hi There").hex() == (
        "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
    assert hmac_sha256(b"Jefe", b"what do ya want for nothing?").hex() \
        == ("5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b9"
            "64ec3843")
    # long-key path (key > block size)
    assert hmac_sha256(b"\xaa" * 131, b"Test Using Larger Than "
                       b"Block-Size Key - Hash Key First").hex() == (
        "60e431591ee0b67f0d8a26aacbf5b77f8e0bc6213728c5140546040f0ee37f54")


def test_hmac_pbkdf2_match_hashlib():
    import hmac as _hmac
    from precios_nexo_sperant_etl_spark.functions.hashes import (
        hmac_sha256, pbkdf2_hmac_sha256)
    rng = random.Random(31)
    for _ in range(60):
        k = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 140)))
        m = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        assert hmac_sha256(k, m) == _hmac.new(k, m, "sha256").digest()
    for it in (1, 2, 7):
        for dklen in (16, 32, 33, 80):
            got = pbkdf2_hmac_sha256(b"pass", b"salt", it, dklen)
            assert got == hashlib.pbkdf2_hmac("sha256", b"pass", b"salt",
                                              it, dklen)
