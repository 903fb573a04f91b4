"""KPI aggregation operators (reference A2-A7 — SURVEY §2.5).

The reference computes these eagerly in a Python dict-building loop
(python_json.py:133-166). Here each is a single groupBy plan: partial
aggregation happens map-side, so the shuffle carries one row per group —
at 100 TB the cost is the scan, not the agg. Exact median is the one
genuinely expensive aggregate (full sort per group under the hood);
``approx=True`` switches to ``percentile_approx`` as the documented
at-scale escape hatch (breaks bit-parity with an exact oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import davg


def _median(c: Column, approx: bool) -> Column:
    return F.percentile_approx(c, 0.5) if approx else F.median(c)


def kpi_cards(df: DataFrame, price_col: str, approx: bool = False) -> DataFrame:
    """Global cards: row count, mean, exact median (python_json.py:138-145).

    Mean/median skip nulls natively (pandas ``.dropna().mean()`` parity).
    """
    return df.agg(
        F.count(F.lit(1)).alias("unidades_totales"),
        davg(F.col(price_col)).alias("precio_promedio"),
        _median(F.col(price_col), approx).alias("precio_median"),
    )


def kpi_by_group(df: DataFrame, group_col: str, price_col: str,
                 approx: bool = False) -> DataFrame:
    """Per-group cards (python_json.py:148-153): unidades, mean, median."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("unidades"),
        davg(F.col(price_col)).alias("precio_promedio"),
        _median(F.col(price_col), approx).alias("precio_median"),
    )


def value_counts(df: DataFrame, col: str, sentinel: str = "__NA__") -> DataFrame:
    """pandas ``fillna("__NA__").value_counts()`` (python_json.py:154-164):
    group counts with nulls bucketed under a sentinel, ordered count desc
    (deterministic tiebreak on the value)."""
    key = F.coalesce(F.col(col).cast("string"), F.lit(sentinel)).alias("value")
    return (df.select(key).groupBy("value").agg(F.count(F.lit(1)).alias("count"))
              .orderBy(F.desc("count"), F.asc("value")))
