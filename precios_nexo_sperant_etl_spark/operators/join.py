"""Join operators (reference J1-J4 — SURVEY §2.3).

The reference's core is one LEFT equi-join of a big fact against a small,
pre-deduplicated dimension. In Spark that is a *broadcast hash join*: the
deduped dimension ships to every executor and the 100 TB probe side never
shuffles. ``left_enrich`` broadcasts explicitly; AQE will still demote to
sort-merge if the build side outgrows the threshold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def left_enrich(left: DataFrame, right: DataFrame, on: Sequence[str],
                broadcast_right: bool = True) -> DataFrame:
    """LEFT equi-join preserving left cardinality (J1, APN:368-370).

    Caller guarantees ``right`` is unique on ``on`` (see
    :func:`..dedup.dedup_keep_latest`) so every left row matches
    exactly-one-or-zero build rows.
    """
    r = broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on), how="left")


def match_flags(enriched: DataFrame, marker: str,
                match_col: str = "tiene_match",
                no_match_col: str = "Sin_Match") -> DataFrame:
    """Left-semi membership flag + complement (J2, APN:422-425).

    ``marker`` is any right-side column that is non-null for every build
    row (e.g. the join key echoed from the right) — cheaper than a second
    semi-join pass over the fact table.
    """
    return (enriched
            .withColumn(match_col, F.col(marker).isNotNull())
            .withColumn(no_match_col, ~F.col(match_col)))


def key_set_difference(a: DataFrame, b: DataFrame, a_key: str, b_key: str) -> DataFrame:
    """Distinct keys present in ``a`` but not ``b`` (J4, APN:467-470).

    A left-anti join on distinct keys — both sides reduce before the join,
    so this stays cheap at any scale.
    """
    left = a.select(F.col(a_key).alias("key")).distinct()
    right = b.select(F.col(b_key).alias("key")).distinct()
    return left.join(right, on="key", how="left_anti").orderBy("key")


def before_after(before: DataFrame, after: DataFrame, on: Sequence[str],
                 suffixes: tuple[str, str] = ("_Antes", "_Despues")) -> DataFrame:
    """Inner self-join aligning pre/post snapshots (J3, APN:473-476).

    Non-key columns get pandas-merge-style suffixes.
    """
    b_sfx, a_sfx = suffixes
    keys = list(on)
    b = before.select(*keys, *[F.col(c).alias(c + b_sfx)
                               for c in before.columns if c not in keys])
    a = after.select(*keys, *[F.col(c).alias(c + a_sfx)
                              for c in after.columns if c not in keys])
    return b.join(a, on=keys, how="inner")
