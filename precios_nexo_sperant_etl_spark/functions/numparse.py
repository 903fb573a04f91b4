"""Locale-tolerant number parsing (reference F4 ``_to_number`` and
F5 ``_safe_num``) as pure Catalyst expression chains.

The reference maps row-at-a-time Python over pandas Series
(Actualizar_Precios_de_Nexo.py:104-131, python_json.py:64-78). Here the
same decision trees are ``when``/``regexp_replace`` chains that stay
JVM-side inside whole-stage codegen — at 100 TB this is the difference
between a scan-speed transform and a Python-pickling bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spreadsheet junk treated as NULL by the KPI extractor (python_json.py:72-73).
NULL_SENTINELS = ("", "NA", "N/A", "#N/A", "#ND", "None", "null", "-")


def to_number(c: Column) -> Column:
    """Mixed-separator numeric parse (``_to_number``, APN:104-128).

    Decision tree (verified empirically against the reference, SURVEY §2.8 F4):

    - strip + remove all spaces; empty → NULL
    - has ``,`` and ``.``: the *last-occurring* separator is the decimal
      point; the other is a thousands separator and is dropped
      (``"1.234.567,89" → 1234567.89``; ``"1,234,567.89" → 1234567.89``)
    - comma only: comma IS the decimal point (``"1,234" → 1.234``)
    - multiple dots, no comma: last dot is the decimal point
      (``"1.234.567" → 1234.567``)
    - unparseable → NULL (never an error)
    """
    s = F.regexp_replace(F.trim(c.cast("string")), " ", "")
    has_comma = s.contains(",")
    has_dot = s.contains(".")
    # Position of the last occurrence = position of first occurrence in the
    # reversed string; smaller reversed-position == occurs later.
    comma_is_decimal = F.instr(F.reverse(s), ",") < F.instr(F.reverse(s), ".")

    eu_style = F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", ".")
    us_style = F.regexp_replace(s, ",", "")
    # Drop every dot that is still followed by another dot → keep only the last.
    last_dot_decimal = F.regexp_replace(s, r"\.(?=.*\.)", "")

    normalized = (
        F.when(has_comma & has_dot,
               F.when(comma_is_decimal, eu_style).otherwise(us_style))
         .when(has_comma, eu_style)
         .otherwise(last_dot_decimal)
    )
    return F.when(s == "", F.lit(None).cast("double")) \
            .otherwise(normalized.try_cast("double"))


def to_number_pandas_udf():
    """Arrow-batched pandas-UDF twin of :func:`to_number` — the documented
    escape hatch for bit-exact parity with the reference's row-wise Python
    on pathological inputs (SURVEY §2.10). ~10-100× slower than the
    Column chain (leaves codegen, crosses to Python per batch); tests
    assert the two agree on the golden table, so the fast path is the
    default everywhere.
    """
    import pandas as pd  # noqa: F401 (resolved by the UDF's type hints)
    from pyspark.sql.functions import pandas_udf

    def _parse_one(s):
        if s is None:
            return None
        txt = str(s).strip().replace(" ", "")
        if txt == "":
            return None
        if "," in txt and "." in txt:
            if txt.rfind(",") > txt.rfind("."):
                txt = txt.replace(".", "").replace(",", ".")
            else:
                txt = txt.replace(",", "")
        elif "," in txt:
            txt = txt.replace(".", "").replace(",", ".")
        else:
            parts = txt.split(".")
            if len(parts) > 2:
                txt = "".join(parts[:-1]) + "." + parts[-1]
        try:
            return float(txt)
        except ValueError:
            return None

    def _to_number_batch(s: "pd.Series") -> "pd.Series":
        return s.map(_parse_one)

    _to_number_batch.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_to_number_batch, "double")


def safe_num(c: Column) -> Column:
    """Strictly es-PE numeric parse (``_safe_num``, python_json.py:64-78).

    Sentinel strings (``NA``, ``#N/A``, ``-`` …) → NULL; then dots are
    thousands separators (dropped) and comma is the decimal point.
    Deliberately *different* semantics from :func:`to_number`: it silently
    mis-parses US-format input (``"1,234.56" → 1.23456``) exactly as the
    reference does — pinned by tests.
    """
    s = F.trim(c.cast("string"))
    cleaned = F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", ".")
    return F.when(s.isin(*NULL_SENTINELS), F.lit(None).cast("double")) \
            .otherwise(cleaned.try_cast("double"))
