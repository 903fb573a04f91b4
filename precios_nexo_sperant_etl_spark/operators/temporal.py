"""Temporal join operators Spark lacks natively: as-of join and banded
range join (SURVEY §7 M5 / the custom-operator mandate).

Both are compositions of built-in DataFrame ops — no UDFs, no custom
physical operators — chosen for their scale shape:

- **As-of join** via the union + carry-forward-window trick: instead of a
  per-left-row lookup (quadratic, or a broadcast-only hack), tag both
  sides, union them, and run ONE window per key ordered by time where
  every left row picks up the last right values seen. Cost: one shuffle
  of |left|+|right| on the key — the same complexity as a regular join.
- **Range join** via time banding: an |a|×|b| inequality join becomes an
  equi-join on coarse time buckets (each row joins its bucket and the
  neighbor bucket), then the exact predicate filters. Work scales with
  rows-per-band, not with the cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_vals: Sequence[str],
              tiebreak: str | None = None) -> DataFrame:
    """LEFT as-of join: each left row is enriched with the ``right_vals``
    of the most recent right row with ``right_ts <= left_ts`` for the
    same key (NULLs when no right row precedes it).

    At equal timestamps the right row wins (``<=`` semantics), matching
    DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts`` — which is the oracle used
    to verify this operator. ``tiebreak`` orders simultaneous right rows
    (last one wins).
    """
    keys = list(on)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    tagged_l = left.select(
        *keys, F.col(left_ts).alias("_t"), F.lit(0).alias("_is_r"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_vals])
    tagged_r = right.select(
        *keys, F.col(right_ts).alias("_t"), F.lit(1).alias("_is_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_vals])
    u = tagged_l.unionByName(tagged_r)

    order = [F.col("_t").asc(), F.col("_is_r").desc()]
    if tiebreak is not None:
        # tiebreak names a right-side value column (renamed _r_* in the
        # union); later-ordered simultaneous right rows win the carry.
        tb = f"_r_{tiebreak}" if tiebreak in right_vals else tiebreak
        order.append(F.col(tb).asc_nulls_first())
    w = (Window.partitionBy(*keys).orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        *keys, "_t", "_is_r", *lcols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_vals])
    return (carried.filter(F.col("_is_r") == 0)
                   .select(*keys, F.col("_t").alias(left_ts), *lcols,
                           *[f"asof_{c}" for c in right_vals]))


def range_join_within(a: DataFrame, b: DataFrame, on: Sequence[str],
                      a_ts: str, b_ts: str, max_gap_s: int) -> DataFrame:
    """Pairs of (a, b) rows sharing ``on`` keys with
    ``|a_ts - b_ts| <= max_gap_s`` — computed via band equi-join.

    Each ``a`` row is assigned its time band plus both neighbors (bands of
    ``max_gap_s`` seconds), so any qualifying pair is guaranteed to meet
    in at least one band; the exact predicate then filters. Pairs landing
    in two common bands are deduped by construction (b joins only its own
    band).
    """
    keys = list(on)
    gap_us = max_gap_s * 1_000_000

    def _us(c):  # microsecond-exact epoch (matches DuckDB epoch_us)
        return F.unix_micros(F.col(c).cast("timestamp"))

    band_a = F.explode(F.array(
        *[F.floor(_us(a_ts) / gap_us).cast("long") + d for d in (-1, 0, 1)]
    )).alias("_band")
    a_t = a.select(*keys, F.col(a_ts).alias("_ta"), _us(a_ts).alias("_ua"), band_a)
    b_t = b.select(*keys, F.col(b_ts).alias("_tb"), _us(b_ts).alias("_ub"),
                   F.floor(_us(b_ts) / gap_us).cast("long").alias("_band"))
    joined = a_t.join(b_t, on=keys + ["_band"], how="inner")
    gap_ok = F.abs(F.col("_ua") - F.col("_ub")) <= gap_us
    return (joined.filter(gap_ok)
                  .select(*keys, F.col("_ta").alias(a_ts), F.col("_tb").alias(b_ts))
                  .distinct())
