"""Key / schema-name normalization (reference F1, F2, F3, F6).

Column-level normalizers are pure Catalyst expressions — they stay inside
whole-stage codegen and cost nothing extra at 100 TB. Schema-NAME
normalizers run driver-side on the tiny header list at ingest (Spark
columns must be unique and addressable before a DataFrame exists).
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_key(c: Column) -> Column:
    """Canonical join-key normalization: cast → trim → lower.

    Mirrors ``_norm`` (Actualizar_Precios_de_Nexo.py:76-78). Null-preserving
    by construction (every step propagates NULL).
    """
    return F.lower(F.trim(c.cast("string")))


def intlike_canon(c: Column) -> Column:
    """Unit-number canonicalization: ``"101.0" → "101"``, else trimmed text.

    Mirrors the lambda at Actualizar_Precios_de_Nexo.py:243-247: strings
    that are digits with at most one dot are parsed as float then truncated
    to an integer string; anything else is just trimmed. Keeps unit numbers
    read as floats by legacy Excel readers joinable against CRM text keys.
    """
    s = c.cast("string")
    digitlike = s.rlike(r"^\d+(\.\d+)?$")
    return F.when(digitlike, s.cast("double").cast("long").cast("string")) \
            .otherwise(F.trim(s))


def clean_col_name(name: str) -> str:
    """Header cleanup: collapse whitespace runs, strip.

    Mirrors ``_clean_cols`` (Actualizar_Precios_de_Nexo.py:80-82).
    """
    return re.sub(r"\s+", " ", str(name)).strip()


def fold_accent_headers(names: list[str]) -> list[str]:
    """Accent-fold + uniquify headers (python_json.py:40-62).

    ``á→a … ú→u``, newlines → spaces, empty → ``col_sin_nombre``,
    duplicates suffixed ``name_2, name_3, …``. Runs driver-side on the
    header row only — Spark requires unique column names.
    """
    cleaned: list[str] = []
    seen: set[str] = set()
    for c in names:
        name = str(c).strip().replace("\n", " ")
        name = re.sub(r"\s+", " ", name)
        name = "".join(
            ch for ch in unicodedata.normalize("NFKD", name)
            if not unicodedata.combining(ch)
        ).strip()
        if not name:
            name = "col_sin_nombre"
        if name in seen:
            k = 2
            while f"{name}_{k}" in seen:
                k += 1
            name = f"{name}_{k}"
        seen.add(name)
        cleaned.append(name)
    return cleaned
