"""Ingest-layer tests: header auto-detection, alias renames,
duplicate-column collapse, null backfill, union-by-name (FIXTURES.md §A2
quirks)."""

from pyspark.sql import functions as F

from precios_nexo_sperant_etl_spark.sources.ingest import (
    COL_ESTADO, COL_NUMERO, COL_PRECIO, drop_all_null_rows, find_header_row,
    ingest_sheet, union_projects)

MESSY_SHEET = [
    ["REPORTE DE PRECIOS", "", "", "", "", ""],          # banner
    ["Generado: 2024", "", "", "", "", ""],              # banner
    ["", "", "", "", "", ""],                            # blank
    ["codigo", "precio  lista", "estado", "Tipología", "Área Total", "Área Total"],
    ["101.0", "1.000,50", "Disponible (Visible)", "A-1", "", "55,5"],
    ["102", "junk", "No Disponible (Vendido)", "B2", "60", ""],
    ["A103", "2.000", "Disponible (Oculto)", "A-9", None, None],
]


def test_find_header_row():
    assert find_header_row(MESSY_SHEET) == 3
    assert find_header_row([["x", "y"], ["1", "2"]]) is None


def test_ingest_sheet_normalization(spark):
    df = ingest_sheet(spark, MESSY_SHEET, project="Matera")
    # alias renames landed ('codigo' -> Número, 'precio lista' -> Precio…)
    for c in ("Proyecto", COL_NUMERO, COL_PRECIO, COL_ESTADO, "Tipología", "_ord"):
        assert c in df.columns, c
    # duplicate 'Área Total' collapsed to one column, first non-null wins
    assert df.columns.count("Área Total") == 1
    rows = {r[COL_NUMERO]: r for r in df.collect()}
    assert rows["101.0"]["Área Total"] == "55,5"      # second dup filled the blank
    assert rows["102"]["Área Total"] == "60"
    # F4 coercion: es-PE price parsed, junk -> NULL
    assert rows["101.0"][COL_PRECIO] == 1000.50
    assert rows["102"][COL_PRECIO] is None
    assert rows["A103"][COL_PRECIO] == 2.0            # "2.000" single-dot -> 2.0
    # ingest ordinal is dense and file-ordered
    assert sorted(r["_ord"] for r in rows.values()) == [0, 1, 2]


def test_union_by_name_null_backfill(spark):
    a = ingest_sheet(spark, MESSY_SHEET, project="Matera")
    b = ingest_sheet(spark, [
        ["Número de inmueble", "Precio de lista", "Estado de inmueble"],
        ["201", "300,25", "Disponible"],
        ["202", "", None],
    ], project="Fenix", header_row=0)
    u = union_projects([a, b])
    assert u.count() == 5
    fenix = u.filter(F.col("Proyecto") == "Fenix").collect()
    assert all(r["Tipología"] is None for r in fenix)  # missing col -> NULL


def test_drop_all_null_rows(spark):
    df = spark.createDataFrame([("a", "1"), (None, None)], "x string, y string")
    assert drop_all_null_rows(df).count() == 1
