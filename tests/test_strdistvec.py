"""Batch (NumPy) string distances must be bit-equal to the scalar
from-scratch implementations on every input shape the suite and the
driver-checked query can produce — including empty strings, unequal
lengths, transposition-heavy pairs, and the customer-name families."""

import random

import numpy as np

from precios_nexo_sperant_etl_spark.functions.strdist import (
    damerau_levenshtein, hamming, jaro_winkler, levenshtein)
from precios_nexo_sperant_etl_spark.functions.strdistvec import (
    damerau_levenshtein_batch, hamming_batch, jaro_winkler_batch,
    levenshtein_batch)


def _random_pairs(rng: random.Random, n: int) -> list[tuple[bytes, bytes]]:
    pairs = []
    alphabet = b"abcde01#"
    for _ in range(n):
        la = rng.randrange(0, 24)
        lb = rng.randrange(0, 24)
        a = bytes(rng.choice(alphabet) for _ in range(la))
        b = bytes(rng.choice(alphabet) for _ in range(lb))
        pairs.append((a, b))
    # adversarial shapes from the strdist docstring and query families
    pairs += [(b"ca", b"abc"), (b"", b""), (b"", b"x"), (b"x", b""),
              (b"Customer#000000001", b"Customer#000000008"),
              (b"Customer#000000010", b"Customer#00000001O"),
              (b"Customer#000000123", b"321000000#remotsuC"),
              (b"abab", b"baba"), (b"aaaa", b"aaaa")]
    return pairs


def test_batch_matches_scalar():
    rng = random.Random(20260817)
    pairs = _random_pairs(rng, 500)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    lev = levenshtein_batch(a, b)
    dl = damerau_levenshtein_batch(a, b)
    jw = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert lev[i] == levenshtein(x, y), (x, y)
        assert dl[i] == damerau_levenshtein(x, y), (x, y)
        # raw float equality: same formula, same operation order
        assert jw[i] == jaro_winkler(x, y), (x, y)


def test_hamming_batch_matches_scalar():
    rng = random.Random(7)
    xs, ys = [], []
    for _ in range(200):
        n = rng.randrange(0, 24)
        xs.append(bytes(rng.choice(b"ab0O") for _ in range(n)))
        ys.append(bytes(rng.choice(b"ab0O") for _ in range(n)))
    got = hamming_batch(xs, ys)
    for i in range(len(xs)):
        assert got[i] == hamming(xs[i], ys[i])


def test_hamming_batch_rejects_unequal():
    try:
        hamming_batch([b"ab"], [b"abc"])
    except ValueError:
        return
    raise AssertionError("unequal lengths must raise")


def test_jw_micro_quantization_matches():
    """The query publishes round(jw * 1e6); the batch path must agree
    after the same quantization on the exact name shapes it sees."""
    names = [f"Customer#{i:09d}".encode() for i in range(1, 60)]
    fams = ([(x, y) for x, y in zip(names, names[7:])]
            + [(x, x[::-1]) for x in names]
            + [(x, x.replace(b"0", b"O")) for x in names])
    a = [p[0] for p in fams]
    b = [p[1] for p in fams]
    jw = jaro_winkler_batch(a, b)
    got = np.rint(jw * 1000000.0).astype(np.int64)
    for i, (x, y) in enumerate(fams):
        assert got[i] == round(jaro_winkler(x, y) * 1000000.0)
