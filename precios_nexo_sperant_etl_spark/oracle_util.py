"""Shared snippets for DuckDB oracle SQL."""

from __future__ import annotations


def duck_bround(expr: str, ndigits: int) -> str:
    """DuckDB twin of Spark ``F.bround`` — half-even on the double's
    SHORTEST round-trip decimal repr, which is what Spark actually rounds
    (``RoundBase`` goes through ``BigDecimal.valueOf(double)``, i.e.
    ``Double.toString``'s shortest repr).

    Two DuckDB-native routes both diverge from that on ties:

    - ``round_even(double, d)`` multiplies by ``10^d`` first, which can
      shift a near-tie value ONTO .5 and flip the result by one digit
      (observed: ``round_even(0.48724999999999996, 4) → 0.4873`` while
      Spark bround gives 0.4872);
    - ``CAST(… AS DECIMAL(20,17))`` rounds the BINARY expansion, so a
      double whose shortest repr is a true tie (e.g. ``0.48725``) but
      whose binary expansion sits just above it rounds UP where Spark's
      shortest-repr tie rounds to even (observed at sf0.1 on quality).

    (``round_even`` can't help even on a DECIMAL argument: its only
    implementation casts back to DOUBLE first — ``typeof`` says DOUBLE —
    so the tie shift reappears.)

    This twin therefore does the rounding in PURE decimal arithmetic:

    1. pin the shortest repr — double→VARCHAR is shortest-round-trip in
       DuckDB (same digits as Java's ``Double.toString``), and
       VARCHAR→DECIMAL(33,20) parses those digits exactly (scientific
       notation included);
    2. scale by ``10^d`` with a typed DECIMAL multiply (33+d digits stays
       under DuckDB's 38-digit cap, so no silent double fallback);
    3. half-even by hand on ``floor`` + exact fractional compare, the
       tie adding 1 exactly when the floor is odd (works for negatives:
       floor(-5812.5) = -5813, odd → -5812, the even neighbor);
    4. divide back in decimal and cast to DOUBLE (nearest-double of the
       exact scaled value — the same thing ``BigDecimal.doubleValue``
       returns).

    Verified bit-identical to Spark on true ties (0.58125 → 0.5812),
    below-tie near-misses (0.49974999999999997 → 0.4997), negatives,
    and subnormal-ish magnitudes. Scale 20 covers any shortest repr with
    |value| < 1e13; every current caller rounds ratio-of-counts values
    in [0, 100].
    """
    p = 10 ** ndigits
    sc = (f"(CAST(CAST(CAST(({expr}) AS DOUBLE) AS VARCHAR) "
          f"AS DECIMAL(33,20)) * CAST({p} AS DECIMAL({ndigits + 1},0)))")
    fl = f"floor({sc})"
    frac = f"({sc} - {fl})"
    rounded = (f"(CASE WHEN {frac} > 0.5 THEN {fl} + 1 "
               f"WHEN {frac} < 0.5 THEN {fl} "
               f"WHEN CAST({fl} AS BIGINT) % 2 = 0 THEN {fl} "
               f"ELSE {fl} + 1 END)")
    return (f"CAST(CAST({rounded} AS DECIMAL(38,{max(ndigits, 1)})) "
            f"/ CAST({p} AS DECIMAL({ndigits + 1},0)) AS DOUBLE)")
