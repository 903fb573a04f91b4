"""Shared snippets for DuckDB oracle SQL."""

from __future__ import annotations


def duck_bround(expr: str, ndigits: int) -> str:
    """DuckDB twin of Spark ``F.bround`` (half-even on the value's exact
    decimal expansion).

    DuckDB's ``round_even(double, d)`` multiplies by ``10^d`` first, which
    can shift a near-tie value ONTO .5 and flip the result by one digit
    (observed: ``round_even(0.48724999999999996, 4) → 0.4873`` while Spark
    bround — correctly — gives 0.4872). Routing through a high-scale
    DECIMAL makes the rounding operate on the exact expansion, matching
    Spark's BigDecimal semantics including true ties.
    """
    return f"CAST(round_even(CAST({expr} AS DECIMAL(20,17)), {ndigits}) AS DOUBLE)"
