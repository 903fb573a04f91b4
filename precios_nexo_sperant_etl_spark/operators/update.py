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
