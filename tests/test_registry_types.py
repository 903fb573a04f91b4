"""Published-type policy guard over every registered oracle.

Every driver hash-red across r02-r05 published an int128-backed DuckDB
value (HUGEINT, or DECIMAL with precision > 18) while comparing
bit-exact locally in every mode; every cast-to-int64-backed fix flipped
the query green. Until the mechanism canary pair
(``canary_decimal_narrow`` / ``canary_decimal_wide``,
``queries_scale.py``) settles the question with driver evidence, the
engine-wide policy is: published (result-facing) columns stay within
int64-backed types — internal accumulation may be as wide as it likes.

This test DESCRIBEs all ~200 oracle SQLs against the tiny fixture (no
execution, schema inference only) and fails if any column outside the
deliberate wide canary publishes HUGEINT / UHUGEINT / DECIMAL(p>18).
Because ``tools/check_parity.py`` is type-strict (Spark and DuckDB
result types must canonicalize identically), oracle-side narrowness
implies Spark-side narrowness for every parity-green query — so this
single sweep guards both engines.
"""

import re

import duckdb
import pytest

from conftest import SF_DIR

ALLOWED_WIDE = {"canary_decimal_wide"}  # the deliberate int128 probe


@pytest.fixture(scope="module")
def oracle_schemas():
    from precios_nexo_sperant_etl_spark import registry
    from precios_nexo_sperant_etl_spark.sources.tables import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    out = {}
    for name, sql in registry.oracle_sql().items():
        out[name] = con.execute(f"DESCRIBE {sql}").fetchall()
    return out


def _is_int128(typ: str) -> bool:
    t = typ.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return True
    m = re.match(r"DECIMAL\((\d+),", t)
    return bool(m and int(m.group(1)) > 18)


def test_no_int128_published_types(oracle_schemas):
    offenders = [
        (name, col, typ)
        for name, desc in oracle_schemas.items()
        if name not in ALLOWED_WIDE
        for col, typ, *_ in desc
        if _is_int128(typ)
    ]
    assert not offenders, (
        "int128-backed published types (the r02-r05 driver hash-red "
        f"signature): {offenders} — cast the published column to an "
        "int64-backed width (DECIMAL(<=18,s) / BIGINT) on both engines")


def test_wide_canary_still_wide(oracle_schemas):
    """The probe half of the mechanism canary must keep publishing
    int128 — a well-meant 'fix' here would blind the experiment."""
    desc = oracle_schemas["canary_decimal_wide"]
    assert any(_is_int128(typ) for _, typ, *_ in desc), desc
