"""AES + GCM: FIPS-197 / NIST SP 800-38D vectors, both-direction
interop pins against the INDEPENDENT javax.crypto (JVM)
AES/GCM/NoPadding, and the tamper-refusal contract."""

import random

import pytest

from precios_nexo_sperant_etl_spark.functions.aesgcm import (
    AesError, aes_key, decrypt_block, encrypt_block, gcm_decrypt,
    gcm_encrypt)


def test_fips197_block_vectors():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert encrypt_block(aes_key(key), pt).hex() \
        == "3925841d02dc09fbdc118597196a0b32"
    p = bytes.fromhex("00112233445566778899aabbccddeeff")
    k192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                         "1011121314151617")
    k256 = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                         "101112131415161718191a1b1c1d1e1f")
    assert encrypt_block(aes_key(k192), p).hex() \
        == "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert encrypt_block(aes_key(k256), p).hex() \
        == "8ea2b7ca516745bfeafc49904b496089"
    for k in (key, k192, k256):
        assert decrypt_block(aes_key(k), encrypt_block(aes_key(k), p)) \
            == p


def test_nist_gcm_vectors():
    key = bytes.fromhex("feffe9928665731c6d6a8f9467308308")
    iv = bytes.fromhex("cafebabefacedbaddecaf888")
    pt = bytes.fromhex(
        "d9313225f88406e5a55909c5aff5269a86a7a9531534f7da2e4c303d8a31"
        "8a721c3c0c95956809532fcf0e2449a6b525b16aedf5aa0de657ba637b39"
        "1aafd255")
    ct, tag = gcm_encrypt(key, iv, pt)
    assert tag.hex() == "4d5c2af327cd64a62cf35abd2ba6fab4"
    aad = bytes.fromhex("feedfacedeadbeeffeedfacedeadbeefabaddad2")
    ct, tag = gcm_encrypt(key, iv, pt[:60], aad)
    assert tag.hex() == "5bc94fbc3221a5db94fae95ae7121a47"
    assert gcm_decrypt(key, iv, ct, tag, aad) == pt[:60]
    # empty everything (test case 1 with the zero key)
    ct, tag = gcm_encrypt(b"\x00" * 16, b"\x00" * 12, b"")
    assert ct == b""
    assert tag.hex() == "58e2fccefa7e3061367f1d57a4e7455a"


def test_tamper_refusal():
    key, iv = b"k" * 16, b"n" * 12
    ct, tag = gcm_encrypt(key, iv, b"secret payload", b"aad")
    with pytest.raises(AesError):
        gcm_decrypt(key, iv, ct, bytes(16), b"aad")
    with pytest.raises(AesError):
        gcm_decrypt(key, iv, ct[:-1] + bytes([ct[-1] ^ 1]), tag, b"aad")
    with pytest.raises(AesError):
        gcm_decrypt(key, iv, ct, tag, b"other aad")
    with pytest.raises(AesError):
        aes_key(b"short")


def _jvm_gcm(spark, key, iv, data, aad, encrypt=True, tag=b""):
    jvm = spark.sparkContext._jvm
    cipher = jvm.javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    ks = jvm.javax.crypto.spec.SecretKeySpec(key, "AES")
    spec = jvm.javax.crypto.spec.GCMParameterSpec(128, iv)
    mode = jvm.javax.crypto.Cipher.ENCRYPT_MODE if encrypt \
        else jvm.javax.crypto.Cipher.DECRYPT_MODE
    cipher.init(mode, ks, spec)
    if aad:
        cipher.updateAAD(aad)
    return bytes(cipher.doFinal(data + (b"" if encrypt else tag)))


def test_jvm_decrypts_ours(spark):
    rng = random.Random(51)
    for klen in (16, 24, 32):
        for _ in range(6):
            key = bytes(rng.randrange(256) for _ in range(klen))
            iv = bytes(rng.randrange(256) for _ in range(12))
            pt = bytes(rng.randrange(256)
                       for _ in range(rng.randrange(0, 200)))
            aad = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(0, 40)))
            ct, tag = gcm_encrypt(key, iv, pt, aad)
            assert _jvm_gcm(spark, key, iv, ct, aad, encrypt=False,
                            tag=tag) == pt


def test_ours_decrypts_jvm(spark):
    rng = random.Random(52)
    for klen in (16, 24, 32):
        for _ in range(6):
            key = bytes(rng.randrange(256) for _ in range(klen))
            iv = bytes(rng.randrange(256) for _ in range(12))
            pt = bytes(rng.randrange(256)
                       for _ in range(rng.randrange(0, 200)))
            aad = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(0, 40)))
            blob = _jvm_gcm(spark, key, iv, pt, aad)   # ct || tag
            ct, tag = blob[:-16], blob[-16:]
            ours_ct, ours_tag = gcm_encrypt(key, iv, pt, aad)
            assert (ours_ct, ours_tag) == (ct, tag)     # bit-identical
            assert gcm_decrypt(key, iv, ct, tag, aad) == pt


def test_non_96bit_ivs_match_jvm(spark):
    rng = random.Random(77)
    for ivlen in (8, 13, 16, 20, 32):
        key = bytes(rng.randrange(256) for _ in range(16))
        iv = bytes(rng.randrange(256) for _ in range(ivlen))
        pt = bytes(rng.randrange(256) for _ in range(70))
        blob = _jvm_gcm(spark, key, iv, pt, b"hdr")
        ct, tag = gcm_encrypt(key, iv, pt, b"hdr")
        assert ct + tag == blob
