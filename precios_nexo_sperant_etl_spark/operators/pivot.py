"""Pivot / percent-of-total operators (reference A8, A9 — SURVEY §2.5,
the dashboard's stacked-bar data cube, index_2.html:320-335, 369-395).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pivot_counts(df: DataFrame, row_col: str, pivot_col: str,
                 pivot_values: Sequence[str]) -> DataFrame:
    """2-D count cube: one row per ``row_col``, one column per pivot value.

    ``pivot_values`` is pinned explicitly — at scale this avoids the extra
    distinct-collect job Spark otherwise runs to discover the columns, and
    keeps the output schema stable. Missing combinations are 0.
    """
    out = df.groupBy(row_col).pivot(pivot_col, list(pivot_values)).count()
    return out.na.fill(0, subset=list(pivot_values))


def pct_within_group(df: DataFrame, group_col: str, label_col: str,
                     ndigits: int = 2) -> DataFrame:
    """Percent-of-group-total (A9): count per (group, label) plus
    ``100*count/group_total`` rounded half-even — the dashboard's "%"
    toggle. One aggregation shuffle + a window over the reduced rows."""
    counts = df.groupBy(group_col, label_col).agg(F.count(F.lit(1)).alias("count"))
    total = F.sum("count").over(Window.partitionBy(group_col))
    return counts.withColumn(
        "pct", F.bround(F.lit(100) * F.col("count") / total, ndigits))
