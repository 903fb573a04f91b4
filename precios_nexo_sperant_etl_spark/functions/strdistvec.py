"""NumPy-vectorized batch twins of ``functions.strdist``.

Same published algorithms — Wagner-Fischer, unrestricted
Lowrance-Wagner Damerau-Levenshtein, Jaro 1989 + Winkler 1990 boost,
Hamming — computed for a whole Arrow batch of byte-string pairs at
once: the DP recurrences stay cell-sequential but every cell step is
one vector operation across the batch (guide §4.2: hand whole batches
to vectorized native libraries instead of looping over rows in
Python). Bit-equality with the scalar module is pinned in
``tests/test_strdistvec.py`` over random byte strings, and the
driver-checked query pins the results against DuckDB's four native
implementations.

All functions take lists of ``bytes`` and return NumPy arrays.
"""

from __future__ import annotations

import numpy as np


def _pack(strs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """(n, max_len) uint8 matrix (zero-padded) + per-row lengths."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int32, count=n)
    m = int(lens.max()) if n else 0
    mat = np.zeros((n, m), dtype=np.uint8)
    for i, s in enumerate(strs):
        mat[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    return mat, lens


def levenshtein_batch(a: list[bytes], b: list[bytes]) -> np.ndarray:
    A, la = _pack(a)
    B, lb = _pack(b)
    n = len(a)
    ma, mb = A.shape[1], B.shape[1]
    prev = np.broadcast_to(np.arange(mb + 1, dtype=np.int32),
                           (n, mb + 1)).copy()
    res = np.where(la == 0, lb, 0).astype(np.int32)
    cur = np.empty_like(prev)
    for i in range(1, ma + 1):
        cur[:, 0] = i
        ai = A[:, i - 1:i]                       # (n, 1)
        sub = prev[:, :-1] + (ai != B).astype(np.int32)
        dele = prev[:, 1:] + 1
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(np.minimum(dele[:, j - 1],
                                              cur[:, j - 1] + 1),
                                   sub[:, j - 1])
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return res


def damerau_levenshtein_batch(a: list[bytes], b: list[bytes]) -> np.ndarray:
    A, la = _pack(a)
    B, lb = _pack(b)
    n = len(a)
    ma, mb = A.shape[1], B.shape[1]
    inf = ma + mb
    # full cube needed: the transpose term reads d[k][pl] for arbitrary
    # earlier rows (Lowrance-Wagner), so no rolling rows here.
    d = np.full((n, ma + 2, mb + 2), inf, dtype=np.int32)
    d[:, 1, 1:mb + 2] = np.arange(mb + 1, dtype=np.int32)
    d[:, 1:ma + 2, 1] = np.arange(ma + 1, dtype=np.int32)
    da = np.zeros((n, 256), dtype=np.int32)
    rows = np.arange(n)
    for i in range(1, ma + 1):
        db = np.zeros(n, dtype=np.int32)
        ai = A[:, i - 1]
        for j in range(1, mb + 1):
            bj = B[:, j - 1]
            k = da[rows, bj]
            pl = db.copy()
            eq = ai == bj
            cost = (~eq).astype(np.int32)
            db = np.where(eq, j, db)
            trans = (d[rows, k, pl] + (i - k - 1) + 1 + (j - pl - 1))
            v = np.minimum(np.minimum(d[:, i, j] + cost,
                                      d[:, i + 1, j] + 1),
                           np.minimum(d[:, i, j + 1] + 1, trans))
            d[:, i + 1, j + 1] = v
        da[rows, ai] = i
    return d[rows, la + 1, lb + 1]


def jaro_batch(a: list[bytes], b: list[bytes]) -> np.ndarray:
    A, la = _pack(a)
    B, lb = _pack(b)
    n = len(a)
    ma, mb = A.shape[1], B.shape[1]
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    avalid = (np.arange(ma)[None, :] < la[:, None])
    bvalid = (np.arange(mb)[None, :] < lb[:, None])
    matched_a = np.zeros((n, ma), dtype=bool)
    matched_b = np.zeros((n, mb), dtype=bool)
    for i in range(ma):
        found = np.zeros(n, dtype=bool)
        ai = A[:, i]
        ok_i = avalid[:, i]
        lo = np.maximum(0, i - win)
        hi = np.minimum(lb, i + win + 1)          # exclusive
        for j in range(mb):
            in_win = (j >= lo) & (j < hi) & bvalid[:, j]
            hit = (~found & ok_i & in_win & ~matched_b[:, j]
                   & (ai == B[:, j]))
            matched_a[:, i] |= hit
            matched_b[:, j] |= hit
            found |= hit
    m = matched_a.sum(axis=1).astype(np.int64)
    # compact matched chars in order for the transposition count
    max_m = int(m.max()) if n else 0
    am = np.zeros((n, max_m), dtype=np.uint8)
    bm = np.zeros((n, max_m), dtype=np.uint8)
    if max_m:
        pa = np.cumsum(matched_a, axis=1) - 1
        pb = np.cumsum(matched_b, axis=1) - 1
        ra, ca = np.nonzero(matched_a)
        am[ra, pa[ra, ca]] = A[ra, ca]
        rb, cb = np.nonzero(matched_b)
        bm[rb, pb[rb, cb]] = B[rb, cb]
    t = ((am != bm)
         & (np.arange(max_m)[None, :] < m[:, None])).sum(axis=1) // 2
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    sim = np.where(m == 0, 0.0, sim)
    both_empty = (la == 0) & (lb == 0)
    sim = np.where(both_empty, 1.0, sim)
    one_empty = ((la == 0) ^ (lb == 0))
    return np.where(one_empty, 0.0, sim)


def jaro_winkler_batch(a: list[bytes], b: list[bytes], p: float = 0.1,
                       threshold: float = 0.7) -> np.ndarray:
    sim = jaro_batch(a, b)
    A, la = _pack(a)
    B, lb = _pack(b)
    k = min(4, A.shape[1], B.shape[1])
    if k:
        eq = (A[:, :k] == B[:, :k]) \
            & (np.arange(k)[None, :] < np.minimum(la, lb)[:, None])
        # common prefix length: first False stops the run
        pre = np.where(eq.all(axis=1), k, eq.argmin(axis=1))
    else:
        pre = np.zeros(len(a), dtype=np.int64)
    boost = sim > threshold
    return np.where(boost, sim + pre * p * (1.0 - sim), sim)


def hamming_batch(a: list[bytes], b: list[bytes]) -> np.ndarray:
    A, la = _pack(a)
    B, lb = _pack(b)
    if (la != lb).any():
        raise ValueError("hamming distance needs equal-length inputs")
    m = min(A.shape[1], B.shape[1])
    valid = np.arange(m)[None, :] < la[:, None]
    return ((A[:, :m] != B[:, :m]) & valid).sum(axis=1).astype(np.int64)
