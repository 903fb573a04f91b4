"""Update-rule operators (reference F14 ``_apply_update`` and the
tower-prefix conditional masked update P11 — SURVEY §2.2, §2.8).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def coalesce_update(existing: Column, new: Column,
                    mode: str = "preferir_nuevo") -> Column:
    """The pipeline's central update semantic (APN:143-147).

    ``preferir_nuevo`` → ``COALESCE(new, existing)``;
    ``preferir_existente`` → ``COALESCE(existing, new)``.
    """
    if mode == "preferir_existente":
        return F.coalesce(existing, new)
    return F.coalesce(new, existing)


def tower_prefix(df: DataFrame, *, project_col: str, typology_col: str,
                 unit_col: str, projects: Iterable[str] = ("capadocia", "matera", "napoles"),
                 letters: Iterable[str] = ("A", "B")) -> DataFrame:
    """Idempotent tower-letter prefixing (APN:256-291).

    For rows whose project (trim+lower) is in ``projects``: take the first
    character of the typology, uppercase; if it is a whitelisted letter and
    the unit number does not already look like ``^[AB]\\d+$``
    (case-insensitive, APN:282), prepend it. Everything else passes
    through untouched. Running twice changes nothing (the regex guard).
    """
    letters = list(letters)
    letter_class = "".join(letters)
    proj_mask = F.lower(F.trim(F.col(project_col).cast("string"))).isin(*projects)
    letter = F.upper(F.substring(F.trim(F.col(typology_col).cast("string")), 1, 1))
    letter_ok = letter.isin(*letters)
    num = F.trim(F.col(unit_col).cast("string"))
    already = F.upper(num).rlike(f"^[{letter_class}]\\d+$")
    return df.withColumn(
        unit_col,
        F.when(proj_mask & letter_ok & ~already, F.concat(letter, num)).otherwise(num),
    )


def scd2_merge(dim, updates, keys, tracked, ts_col="effective_ts",
               update_ts_col="update_ts"):
    """Type-2 slowly-changing-dimension merge: apply a batch of updates
    to a versioned dimension, closing changed rows and opening new
    versions.

    ``dim`` carries (keys, tracked..., effective_ts, end_ts NULL for
    current). For each update whose tracked values differ from the
    key's CURRENT row: the current row is closed (end_ts = update ts)
    and a new open row is appended. Unchanged updates are no-ops; new
    keys open their first version.

    One shuffle each side on the key; the diff is a null-safe
    comparison so NULL→value and value→NULL both count as changes. This
    is the warehouse-side twin of the reference's overwrite-style
    update (F14) when history must be kept instead of overwritten.
    """
    from pyspark.sql import functions as F

    keys = list(keys)
    tracked = list(tracked)
    current = dim.filter(F.col("end_ts").isNull())
    closed_already = dim.filter(F.col("end_ts").isNotNull())

    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
        F.col(update_ts_col).alias("_uts"))
    # A batch may carry several updates for one key; applying them all
    # through the full-outer join would fan out the current row and open
    # several simultaneous versions. Keep only the LATEST update per key
    # (ts desc, tracked values as a deterministic tiebreak) — the
    # intermediate versions never became current within this batch.
    from pyspark.sql import Window
    latest = Window.partitionBy(*keys).orderBy(
        F.col("_uts").desc(),
        *[F.col(f"_u_{c}").desc_nulls_last() for c in tracked])
    u = (u.withColumn("_rn", F.row_number().over(latest))
          .filter(F.col("_rn") == 1).drop("_rn"))
    j = current.join(u, keys, "full_outer")

    changed = [~F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked]
    any_change = changed[0]
    for c in changed[1:]:
        any_change = any_change | c
    has_update = F.col("_uts").isNotNull()
    is_new_key = F.col(ts_col).isNull()

    kept_open = (j.filter(~has_update | (~is_new_key & ~any_change))
                  .select(*keys, *tracked, ts_col, "end_ts"))
    closed_now = (j.filter(has_update & ~is_new_key & any_change)
                   .select(*keys, *tracked, ts_col,
                           F.col("_uts").alias("end_ts")))
    opened = (j.filter(has_update & (is_new_key | any_change))
               .select(*keys,
                       *[F.col(f"_u_{c}").alias(c) for c in tracked],
                       F.col("_uts").alias(ts_col),
                       F.lit(None).cast(dim.schema["end_ts"].dataType)
                        .alias("end_ts")))
    return (closed_already.select(*keys, *tracked, ts_col, "end_ts")
            .unionByName(kept_open).unionByName(closed_now)
            .unionByName(opened))
