"""Change-audit operators (reference A1, A7, F16-F19 — SURVEY §2.5, §2.8).

The audit is the reference's stage 11 (APN:411-479): compare the table
before/after the enrich-update, flag per-row changes, and aggregate a
per-group summary with match/change counts and ratios.

One shuffle total: the change flags are row-local expressions over the
already-joined frame; only the final ``groupBy`` moves data, and it reduces
to one row per group map-side before shuffling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.compare import isclose, nullsafe_neq


def change_flags(df: DataFrame, *, price_before: str, price_after: str,
                 state_before: str, state_after: str,
                 match_col: str = "tiene_match") -> DataFrame:
    """Row-level change detection (APN:427-446).

    Price change = NOT ``numpy.isclose(..., equal_nan=True)`` — a missing
    price on both sides is *no change*. State change = null-safe,
    case-sensitive inequality. ``Sin_Cambio`` additionally requires a match
    (an unmatched row is neither changed nor unchanged, APN:445).
    """
    price_changed = ~isclose(F.col(price_before), F.col(price_after))
    state_changed = nullsafe_neq(F.col(state_before), F.col(state_after))
    return (df
            .withColumn("Cambio_PrecioLista", price_changed)
            .withColumn("Cambio_Estado", state_changed)
            .withColumn("Algun_Cambio", F.col("Cambio_PrecioLista") | F.col("Cambio_Estado"))
            .withColumn("Sin_Cambio", ~F.col("Algun_Cambio") & F.col(match_col)))


def _bool_sum(c: str) -> Column:
    return F.sum(F.col(c).cast("int")).cast("long")


def audit_summary(flagged: DataFrame, group_col: str = "Proyecto") -> DataFrame:
    """Per-group audit summary with ratios (APN:449-464).

    ``Registros`` counts every row including null groups (pandas
    ``groupby(dropna=False).size()``; Spark keeps null groups natively).
    Booleans are summed as ints; ratios are rounded half-even to 4 places
    (pandas ``.round`` → ``F.bround``).
    """
    agg = flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("Registros"),
        _bool_sum("tiene_match").alias("Con_Match"),
        _bool_sum("Sin_Match").alias("Sin_Match"),
        _bool_sum("Algun_Cambio").alias("Cambios"),
        _bool_sum("Cambio_PrecioLista").alias("Cambios_Precio"),
        _bool_sum("Cambio_Estado").alias("Cambios_Estado"),
        _bool_sum("Sin_Cambio").alias("Sin_Cambio"),
    )
    for col in ("Con_Match", "Sin_Match", "Cambios", "Sin_Cambio"):
        agg = agg.withColumn(f"pct_{col}", F.bround(F.col(col) / F.col("Registros"), 4))
    return agg
