"""Edit-distance primitives vs DuckDB's independent implementations
(random byte strings, unicode multi-byte semantics, classic published
vectors, metric properties)."""

import random

import duckdb
import pytest

from precios_nexo_sperant_etl_spark.functions.strdist import (
    damerau_levenshtein, hamming, jaro, jaro_winkler, levenshtein)


def test_classic_vectors():
    assert levenshtein(b"kitten", b"sitting") == 3
    assert levenshtein(b"", b"abc") == 3
    assert levenshtein(b"abc", b"abc") == 0
    # unrestricted DL: transposition then insertion between the pair
    assert damerau_levenshtein(b"ca", b"abc") == 2
    assert damerau_levenshtein(b"kitten", b"sitting") == 3
    assert damerau_levenshtein(b"ab", b"ba") == 1
    # Winkler's published examples
    assert jaro(b"MARTHA", b"MARHTA") == pytest.approx(0.944444444444)
    assert jaro_winkler(b"MARTHA", b"MARHTA") == pytest.approx(
        0.961111111111)
    assert jaro_winkler(b"DWAYNE", b"DUANE") == pytest.approx(0.84)
    assert jaro_winkler(b"DIXON", b"DICKSONX") == pytest.approx(
        0.813333333333)
    assert jaro_winkler(b"abc", b"") == 0.0
    assert jaro(b"", b"") == 1.0
    assert hamming(b"abcde", b"abcdz") == 1
    with pytest.raises(ValueError):
        hamming(b"ab", b"abc")


def test_random_pairs_match_duckdb():
    con = duckdb.connect()
    rng = random.Random(17)
    for _ in range(400):
        a = "".join(rng.choice("abcdeXYZ01#") for _ in range(
            rng.randrange(0, 14)))
        b = "".join(rng.choice("abcdeXYZ01#") for _ in range(
            rng.randrange(0, 14)))
        rl, rd, rj = con.execute(
            "SELECT levenshtein(?, ?), damerau_levenshtein(?, ?),"
            " jaro_winkler_similarity(?, ?)",
            [a, b, a, b, a, b]).fetchone()
        ba, bb = a.encode(), b.encode()
        assert levenshtein(ba, bb) == rl, (a, b)
        assert damerau_levenshtein(ba, bb) == rd, (a, b)
        if a or b:      # the one divergence: duckdb says jaro('','')=0
            assert jaro_winkler(ba, bb) == pytest.approx(rj,
                                                         abs=1e-12), (a, b)


def test_empty_empty_divergence_documented():
    # classical convention here; DuckDB returns 0.0 for ('','')
    assert jaro(b"", b"") == 1.0
    assert duckdb.connect().execute(
        "select jaro_winkler_similarity('','')").fetchone()[0] == 0.0


def test_byte_semantics_match_duckdb_on_unicode():
    con = duckdb.connect()
    pairs = [("número", "numero"), ("eñe", "ene"), ("漢字", "漢"),
             ("ü", "u"), ("año", "ano")]
    for a, b in pairs:
        rl, rd = con.execute(
            "SELECT levenshtein(?, ?), damerau_levenshtein(?, ?)",
            [a, b, a, b]).fetchone()
        assert levenshtein(a.encode(), b.encode()) == rl, (a, b)
        assert damerau_levenshtein(a.encode(), b.encode()) == rd, (a, b)


def test_metric_properties():
    rng = random.Random(23)
    words = [bytes(rng.choice(b"abcd") for _ in range(
        rng.randrange(0, 9))) for _ in range(30)]
    for f in (levenshtein, damerau_levenshtein):
        for a in words[:10]:
            assert f(a, a) == 0
        for a, b in zip(words, words[1:]):
            assert f(a, b) == f(b, a)
        for a, b, c in zip(words, words[1:], words[2:]):
            assert f(a, c) <= f(a, b) + f(b, c)   # triangle inequality
    # DL never exceeds Levenshtein (it has strictly more operations)
    for a, b in zip(words, words[1:]):
        assert damerau_levenshtein(a, b) <= levenshtein(a, b)
