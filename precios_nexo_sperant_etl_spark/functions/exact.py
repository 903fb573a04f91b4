"""Deterministic floating-point aggregation helpers.

Double addition is not associative, so a plain ``SUM(double)`` over a
shuffled 100 TB table returns a *different last-ulp value per run* — which
breaks reproducibility guarantees and value-hash comparisons against any
oracle. These helpers route the accumulation through exact decimal
arithmetic: cast each addend to a high-scale DECIMAL (exact within 12
decimal places — far below the data's ulp), sum exactly, then cast the
single final value back to double. Cost: decimal sum instead of double sum
in the partial aggregate — still map-side combinable, still one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Scale chosen so that business values (≤1e9, ≥1e-4) round identically in
#: every engine; precision 26 + Spark's +10 sum headroom stays ≤ 38.
_PRECISION = 26
_SCALE = 12


def _dec(c: Column) -> Column:
    return c.cast(f"decimal({_PRECISION},{_SCALE})")


def dsum(c: Column) -> Column:
    """Deterministic ``SUM(double)`` via exact decimal accumulation."""
    return F.sum(_dec(c)).cast("double")


def davg(c: Column) -> Column:
    """Deterministic ``AVG(double)``: exact decimal sum ÷ count."""
    return (F.sum(_dec(c)).cast("double") / F.count(c)).cast("double")


def ddot(a: Column, b: Column) -> Column:
    """Deterministic dot product of two ``array<float>`` columns.

    Products are computed in double (exact for float×float), rounded to
    decimal, and summed exactly — order-independent, so the same vectors
    give the same cosine on any partitioning or engine.
    """
    prods = F.zip_with(a, b, lambda x, y: _dec(x.cast("double") * y.cast("double")))
    return F.aggregate(
        prods,
        F.lit(0).cast(f"decimal({_PRECISION + 10},{_SCALE})"),
        lambda acc, x: acc + x,
    ).cast("double")
