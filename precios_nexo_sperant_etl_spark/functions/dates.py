"""Date/timestamp coercion (reference F8 — SURVEY §2.8).

The reference leans on ``pd.to_datetime(errors="coerce")``
(Actualizar_Precios_de_Nexo.py:137): any unparseable date becomes NaT and
the pipeline keeps going. The engine analog is ``try_to_timestamp`` —
codegen'd, never raises (important under Spark 4's ANSI mode, where a
plain CAST of junk *throws*).

Accepted shapes are pinned explicitly rather than inferred per value the
way pandas does (per-value inference is a driver-side luxury; a cluster
needs one deterministic grammar): ISO timestamps/dates first, then the
es-PE ``dd/MM/yyyy`` form the source spreadsheets use. The DuckDB oracle
mirrors the same two-step grammar (``TRY_CAST`` then ``try_strptime``),
so both engines agree cell-for-cell including on junk → NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_datetime_coerce(col: Column) -> Column:
    """F8: parse a string column to timestamp; junk → NULL, never raise.

    ISO (``yyyy-MM-dd[ HH:mm:ss]``) first, then es-PE ``dd/MM/yyyy``.
    """
    s = F.trim(col)
    return F.coalesce(
        F.try_to_timestamp(s),
        F.try_to_timestamp(s, F.lit("dd/MM/yyyy")),
    )
