"""Window-based deduplication and deterministic row ids
(reference W1, W2, W4 — SURVEY §2.6).

The reference relies on pandas' *physical row order* for its tiebreaks
(``sort_values`` is stable; ``drop_duplicates(keep="last")`` keeps the last
physical occurrence). A distributed engine has no physical order, so every
operator here takes an explicit, deterministic tiebreak column — at scale
this is a semantic requirement, not a style choice.

All of these shuffle once on the dedup keys; the window aggregation is
partial-pushdown friendly and AQE handles key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(df: DataFrame, keys: Sequence[str], order_col: str,
                      tiebreak: str | Column | None = None) -> DataFrame:
    """One row per key, the one with the greatest ``order_col`` winning.

    Mirrors ``_resolve_duplicates_sperant`` mode ``max_fecha``
    (Actualizar_Precios_de_Nexo.py:133-140): stable sort by date then keep
    the last. pandas sorts NaT last, so an *undated* row beats any dated
    row — reproduced with ``desc_nulls_first``. ``tiebreak`` replaces the
    reference's positional last-wins rule (use an ingest ordinal).
    """
    order = [F.col(order_col).desc_nulls_first()]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        order.append(tb.desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def dedup_keep_last(df: DataFrame, keys: Sequence[str],
                    ordinal: str | Sequence[str]) -> DataFrame:
    """One row per key, greatest ``ordinal`` wins (mode ``"ultimo"``, APN:141).

    The ordinal column(s) replace pandas' physical position (e.g. a
    ``row_number`` assigned at ingest over file name + in-file offset).
    Pass several columns when one alone is not a total order within a key.
    """
    ordinals = [ordinal] if isinstance(ordinal, str) else list(ordinal)
    w = Window.partitionBy(*keys).orderBy(*[F.col(o).desc() for o in ordinals])
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def add_row_id(df: DataFrame, order_by: Sequence[str | Column],
               name: str = "_rowid") -> DataFrame:
    """Dense, deterministic 0-based row id (APN:336 ``range(len(df))``).

    A global ``row_number`` over an explicit total order. Note for 100 TB:
    an unpartitioned window serializes through one task — use only on
    already-reduced data, or accept ``monotonically_increasing_id`` when
    mere uniqueness suffices (SURVEY §4.2).
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w) - F.lit(1))
