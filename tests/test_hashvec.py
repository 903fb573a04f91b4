"""Batch (NumPy) digests must be bit-equal to both the scalar
from-scratch implementations and hashlib (OpenSSL) over variable-length
lanes, including the empty message and block-boundary lengths."""

import hashlib

from precios_nexo_sperant_etl_spark.functions.hashes import (
    hmac_sha256, md5, pbkdf2_hmac_sha256, sha256)
from precios_nexo_sperant_etl_spark.functions.hashvec import (
    hmac_sha256_batch, md5_batch, pbkdf2_hmac_sha256_batch, sha1_batch,
    sha256_batch)
from precios_nexo_sperant_etl_spark.operators.gitpack import sha1_hex

_LENS = [0, 1, 3, 55, 56, 57, 63, 64, 65, 119, 120, 128, 300, 577, 1000]
_MSGS = [bytes((i * 7 + j) % 256 for j in range(n))
         for i, n in enumerate(_LENS)]


def test_md5_batch():
    got = md5_batch(_MSGS)
    for m, d in zip(_MSGS, got):
        assert d == md5(m) == hashlib.md5(m).digest()


def test_sha1_batch():
    got = sha1_batch(_MSGS)
    for m, d in zip(_MSGS, got):
        assert d.hex() == sha1_hex(m) == hashlib.sha1(m).hexdigest()


def test_sha256_batch():
    got = sha256_batch(_MSGS)
    for m, d in zip(_MSGS, got):
        assert d == sha256(m) == hashlib.sha256(m).digest()


def test_hmac_pbkdf2_batch():
    key = b"corpus-master-key"
    got = hmac_sha256_batch(key, _MSGS)
    for m, d in zip(_MSGS, got):
        assert d == hmac_sha256(key, m)
    salts = [i.to_bytes(8, "big") for i in range(40)]
    got = pbkdf2_hmac_sha256_batch(key, salts, 3, 16)
    for s, d in zip(salts, got):
        assert d == pbkdf2_hmac_sha256(key, s, 3, 16)
        assert d == hashlib.pbkdf2_hmac("sha256", key, s, 3, 16)
