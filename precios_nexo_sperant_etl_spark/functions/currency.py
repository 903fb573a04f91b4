"""F22 — es-PE currency formatting (SURVEY §2.8).

Re-expresses the reference dashboard's ``money()`` helper
(``html_con_datos/index.html:104-106``):
``Intl.NumberFormat("es-PE", {currency: "PEN", maximumFractionDigits: 0})``
with null/NaN rendered as ``"–"``. es-PE PEN output is
``S/ <grouped integer>`` — currency symbol, NO-BREAK SPACE
(exactly what Intl emits), comma thousands grouping, no decimals.

Engine-exact by construction: rounding to integer sol happens FIRST on
an exact DECIMAL (``F.round`` = HALF_UP = Intl's default halfExpand,
away from zero), so the grouping step formats an integer and neither
engine's formatter does any arithmetic. The DuckDB twin
(:func:`duck_format_pen`) mirrors each step.

Display-only by design — this belongs at the presentation edge (the
reference keeps it in JS); it exists here so the engine can emit
report-ready strings where a sink needs them, not for downstream math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: U+2013 EN DASH — the reference's null/NaN placeholder.
NULL_MONEY = "–"

#: U+00A0 NO-BREAK SPACE — what Intl puts between "S/" and the digits.
_NBSP = " "


def format_pen(amount: Column) -> Column:
    """``Intl.NumberFormat("es-PE", PEN, maximumFractionDigits: 0)`` as a
    native column expression: ``S/ 12,345`` / ``"–"`` for null/NaN.

    Negative amounts format as ``S/ -1,234`` (sign inside, matching
    ``format_number``'s output on a negative integer).
    """
    as_dec = amount.cast("decimal(18,2)")
    whole = F.round(as_dec, 0).cast("bigint")  # HALF_UP == Intl halfExpand
    txt = F.concat(F.lit("S/" + _NBSP), F.format_number(whole, 0))
    return (F.when(amount.isNull() | F.isnan(amount.cast("double")),
                   F.lit(NULL_MONEY))
             .otherwise(txt))


def duck_format_pen(expr: str) -> str:
    """DuckDB twin of :func:`format_pen` for oracle SQL (``expr`` is a
    numeric SQL expression)."""
    return (f"CASE WHEN {expr} IS NULL OR isnan(CAST({expr} AS DOUBLE)) "
            f"THEN '{NULL_MONEY}' "
            f"ELSE 'S/{_NBSP}' || format('{{:,}}', "
            f"CAST(round(CAST({expr} AS DECIMAL(18,2)), 0) AS BIGINT)) END")
