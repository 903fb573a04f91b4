"""Tolerant / null-safe comparison predicates (reference F16, F17).

These drive the audit's change detection. Pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def isclose(a: Column, b: Column, rtol: float = 1e-5, atol: float = 1e-8) -> Column:
    """``numpy.isclose(a, b, equal_nan=True)`` semantics (APN:430-434).

    Two NULLs compare *close* (a missing price did not change); a NULL vs a
    value is *not* close. Returns a non-null boolean.
    """
    close = F.abs(a - b) <= (F.lit(atol) + F.lit(rtol) * F.abs(b))
    return F.when(a.isNull() & b.isNull(), F.lit(True)) \
            .otherwise(F.coalesce(close, F.lit(False)))


def nullsafe_neq(a: Column, b: Column) -> Column:
    """Null-safe, case-sensitive inequality (APN:435-436).

    The reference compares ``fillna("__NA__") != fillna("__NA__")`` —
    case-sensitive by design (its committed audit flags *every* state as
    changed because Nexo says ``"Disponible (Visible)"`` while Sperant says
    ``"disponible"``; SURVEY §2.8 F17). Equivalent to ``NOT (a <=> b)``.
    """
    return ~a.eqNullSafe(b)
