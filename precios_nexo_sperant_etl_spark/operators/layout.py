"""Data-layout optimization: Z-order (Morton) clustering keys.

At 100 TB the cheapest query is the one that never reads the file: lake
formats (Delta/Iceberg/Hudi) skip files whose per-column min/max ranges
exclude the predicate. A table sorted on ONE column gives tight ranges
for that column only; interleaving the bits of two columns into a
Z-order key and range-partitioning on it gives *both* columns locality —
every file covers a small rectangle of the (x, y) key space, so
predicates on either dimension (or both) prune files.

Beyond-reference surface. The key is a static chain of shift/and/or
expressions — fully inside whole-stage codegen, no UDF, no shuffle; the
actual clustering write is ``repartitionByRange(zkey).write`` (one range
shuffle, the same cost as any global sort-write).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key_n(cols: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton key: bit ``i`` of column ``j`` lands at key
    position ``i * n + j``, so the key's top bits cycle through every
    dimension — the property that makes coarse range-splits rectangle
    ALL dimensions at once (scale each column to equal bit width with
    :func:`minmax_scaled` first).

    Unrolled at plan-build time into ``n * bits`` constant shift/mask
    terms — Catalyst folds them into one codegen'd expression; cost is
    a few dozen ALU ops per row, no memory traffic.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if not 1 <= bits * n <= 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a 63-bit key")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * n + j))
    return z


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Two-dimensional Morton key (x in even bit positions, y in odd) —
    the common case, delegating to :func:`zorder_key_n`."""
    return zorder_key_n([x, y], bits=bits)


def minmax_scaled(v: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Scale an integer column with known domain ``[lo, hi]`` onto the
    full ``bits``-bit range with exact integer arithmetic
    (``(v - lo) * (2^bits - 1) div (hi - lo)``).

    This is NOT cosmetic: interleaving raw values with asymmetric bit
    widths puts one dimension's bits on top of the key, and any coarse
    range-split (few files) then degenerates into a single-column sort.
    Equal-width scaling is what makes the Morton key's top bits
    alternate dimensions, so even an 8-way split already rectangles
    both. Real OPTIMIZE ZORDER implementations do exactly this from
    column stats; callers here get lo/hi from a 1-row min/max aggregate.
    """
    if hi <= lo:
        return F.lit(0).cast("long")
    span = (1 << bits) - 1
    num = (v.cast("long") - F.lit(lo)) * F.lit(span)
    den = F.lit(hi - lo).cast("long")
    # exact floor-div in Column algebra: strip the remainder (exact
    # integer %), then the double division is of an exact multiple and
    # rounds to the exact integer quotient (all values << 2^53).
    return ((num - num % den) / den).cast("long")


def duck_minmax_scaled(v: str, lo: str, hi: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`minmax_scaled`; ``lo``/``hi`` may be scalar
    subqueries so the oracle derives the same stats from the data."""
    span = (1 << bits) - 1
    return (f"CASE WHEN ({hi}) <= ({lo}) THEN 0 ELSE "
            f"((CAST({v} AS BIGINT) - ({lo})) * {span}) "
            f"// (({hi}) - ({lo})) END")


def duck_zorder_key(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — identical bit arithmetic, so
    an oracle can reproduce keys (and any bucketing derived from them)
    exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
