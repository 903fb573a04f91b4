"""From-scratch string edit distances (byte-level, like DuckDB's).

Implements the classic published algorithms — Wagner-Fischer
Levenshtein, the UNRESTRICTED Damerau-Levenshtein of Lowrance & Wagner
1975 (true adjacent-transposition metric, not the restricted
optimal-string-alignment variant: ``dl("ca","abc") == 2``), Jaro 1989
and the Winkler 1990 prefix boost (window ``max(l1,l2)//2 - 1``,
boost threshold 0.7, prefix cap 4, p = 0.1), and Hamming — operating
on BYTES, matching DuckDB's semantics so the driver oracle can use
DuckDB's independent native implementations as the expected values
(verified bit-exact on the full query pair set, including the raw
float Jaro-Winkler).

These are the record-linkage primitives next to
``fellegi_sunter_weights`` / ``golden_record_merge``; at fleet scale
they run inside Arrow batches on blocked candidate pairs (never
all-pairs — blocking is the caller's job, see the capped/banded
discipline in PLANS.md).
"""

from __future__ import annotations


def levenshtein(a: bytes, b: bytes) -> int:
    """Wagner-Fischer with a rolling row."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def damerau_levenshtein(a: bytes, b: bytes) -> int:
    """Lowrance-Wagner unrestricted DL (transpositions may be followed
    by further edits between the transposed characters)."""
    la, lb = len(a), len(b)
    inf = la + lb
    da: dict[int, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            pl = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,                         # substitute
                d[i + 1][j] + 1,                        # insert
                d[i][j + 1] + 1,                        # delete
                d[k][pl] + (i - k - 1) + 1 + (j - pl - 1))  # transpose
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def jaro(a: bytes, b: bytes) -> float:
    """Classical convention: two empty strings are identical (1.0).
    DuckDB returns 0.0 for that one degenerate input — the only
    divergence, pinned in tests; query pair sets never contain it."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    win = max(la, lb) // 2 - 1
    if win < 0:
        win = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        for j in range(max(0, i - win), min(lb, i + win + 1)):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: bytes, b: bytes, p: float = 0.1,
                 threshold: float = 0.7) -> float:
    sim = jaro(a, b)
    if sim > threshold:
        pre = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            pre += 1
        sim += pre * p * (1.0 - sim)
    return sim


def hamming(a: bytes, b: bytes) -> int:
    if len(a) != len(b):
        raise ValueError("hamming distance needs equal-length inputs")
    return sum(x != y for x, y in zip(a, b))
