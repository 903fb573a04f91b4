"""Golden-semantics tests for the locale number parsers (SURVEY §5):
every row pins behavior verified against the reference implementation
(_to_number, Actualizar_Precios_de_Nexo.py:104-128; _safe_num,
python_json.py:64-78), including the deliberate F4/F5 divergence."""

import pytest

from pyspark.sql import functions as F

from precios_nexo_sperant_etl_spark.functions.numparse import safe_num, to_number

F4_CASES = [
    ("1.234.567,89", 1234567.89),   # es-PE: dots thousands, comma decimal
    ("1,234,567.89", 1234567.89),   # US: commas thousands, dot decimal
    ("1,234", 1.234),               # comma-only => comma IS the decimal
    ("1.234.567", 1234.567),        # multi-dot => last dot is the decimal
    (" 416 881,11 ", 416881.11),    # internal spaces stripped
    ("", None),
    ("junk", None),
    ("101.0", 101.0),
    ("-1.234,5", -1234.5),
    ("1234", 1234.0),
    (None, None),
    ("2,5,7", None),                # comma-only multi-comma -> unparseable
    (".5", 0.5),
    ("1.000", 1.0),                 # single dot stays decimal
]

F5_CASES = [
    ("1.234.567,89", 1234567.89),
    ("1,234.56", 1.23456),          # F5 mis-parses US format BY DESIGN
    ("NA", None), ("#N/A", None), ("-", None), ("None", None),
    ("null", None), ("", None), ("#ND", None), ("N/A", None),
    ("  42  ", 42.0),
    ("3,14", 3.14),
    ("abc", None),
]


def _run(spark, fn, cases):
    df = spark.createDataFrame([(c[0],) for c in cases], "raw string")
    got = [r["out"] for r in df.select(fn(F.col("raw")).alias("out")).collect()]
    for (raw, want), g in zip(cases, got):
        assert g == pytest.approx(want) if want is not None else g is None, \
            f"{raw!r}: want {want}, got {g}"


def test_to_number_golden(spark):
    _run(spark, to_number, F4_CASES)


def test_safe_num_golden(spark):
    _run(spark, safe_num, F5_CASES)


def test_pandas_udf_escape_hatch_agrees_with_column_chain(spark):
    """The Arrow-batched pandas-UDF twin (the documented bit-exactness
    escape hatch) must agree with the Catalyst chain on the golden table."""
    from precios_nexo_sperant_etl_spark.functions.numparse import to_number_pandas_udf
    udf = to_number_pandas_udf()
    df = spark.createDataFrame([(c[0],) for c in F4_CASES], "raw string")
    rows = df.select(to_number(F.col("raw")).alias("fast"),
                     udf(F.col("raw")).alias("exact")).collect()
    for r in rows:
        assert r["fast"] == r["exact"] or (r["fast"] is None and r["exact"] is None)


def test_random_corpus_cross_implementation_agreement(spark):
    """Property-style sweep: 500 seeded pseudo-random separator-soup
    strings must parse identically through the two independent F4
    implementations (Catalyst chain vs row-wise Python twin)."""
    import random

    from precios_nexo_sperant_etl_spark.functions.numparse import to_number_pandas_udf

    rng = random.Random(42)
    alphabet = "0123456789.,- x"
    corpus = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
              for _ in range(500)]
    df = spark.createDataFrame([(s,) for s in corpus], "raw string").coalesce(4)
    rows = df.select("raw", to_number(F.col("raw")).alias("fast"),
                     to_number_pandas_udf()(F.col("raw")).alias("exact")).collect()
    bad = [(r["raw"], r["fast"], r["exact"]) for r in rows
           if r["fast"] != r["exact"]
           and not (r["fast"] is None and r["exact"] is None)]
    assert not bad, f"{len(bad)} disagreements, e.g. {bad[:5]}"


def test_f4_f5_divergence(spark):
    """The two parsers intentionally disagree on US-format input."""
    df = spark.createDataFrame([("1,234.56",)], "raw string")
    row = df.select(to_number(F.col("raw")).alias("f4"),
                    safe_num(F.col("raw")).alias("f5")).collect()[0]
    assert row["f4"] == pytest.approx(1234.56)
    assert row["f5"] == pytest.approx(1.23456)


# ---------------------------------------------------------------------------
# F22 — es-PE PEN money formatting (reference html_con_datos/
# index.html:104-106): Intl.NumberFormat("es-PE", PEN, max 0 fraction
# digits), null/NaN → "–". NBSP between symbol and digits, halfExpand.
# ---------------------------------------------------------------------------

F22_CASES = [
    (0.0, "S/ 0"),
    (1234.4, "S/ 1,234"),
    (1234.5, "S/ 1,235"),        # tie rounds away from zero
    (-1234.5, "S/ -1,235"),      # negative tie: away from zero
    (12345678.89, "S/ 12,345,679"),
    (None, "–"),
    (float("nan"), "–"),
]


def test_f22_format_pen(spark):
    from precios_nexo_sperant_etl_spark.functions.currency import format_pen

    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(F22_CASES)],
        "id int, amount double")
    got = {r["id"]: r["money"]
           for r in df.select("id",
                              format_pen(F.col("amount")).alias("money"))
                      .collect()}
    for i, (_, want) in enumerate(F22_CASES):
        assert got[i] == want, (i, got[i], want)
