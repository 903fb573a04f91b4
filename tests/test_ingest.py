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


def test_tolerant_fan_in(spark, tmp_path):
    """S5 (APN:186-230): missing file → skip, corrupt file → skip,
    surviving files union; zero survivors → RuntimeError."""
    import pytest

    from precios_nexo_sperant_etl_spark.sources.ingest import ingest_project_files

    good = tmp_path / "good.xls"
    good.write_text("placeholder")
    corrupt = tmp_path / "corrupt.xls"
    corrupt.write_text("placeholder")

    def reader(path):
        if "corrupt" in str(path):
            raise ValueError("simulated unreadable workbook")
        return MESSY_SHEET

    skips = []
    df = ingest_project_files(
        spark,
        {"Matera": str(good), "Roto": str(corrupt),
         "Fantasma": str(tmp_path / "absent.xls")},
        reader=reader, on_skip=lambda p, r: skips.append((p, r)))
    assert df.count() == 3  # only the good project's rows
    assert {r["Proyecto"] for r in df.select("Proyecto").distinct().collect()} \
        == {"Matera"}
    assert {p for p, _ in skips} == {"Roto", "Fantasma"}

    with pytest.raises(RuntimeError):
        ingest_project_files(
            spark, {"Fantasma": str(tmp_path / "absent.xls")}, reader=reader)


def test_matera_duplicate_header_collapse(spark):
    """Golden ingest test mirroring tablas_actualizadas/Matera.xlsx's
    86-column layout: four headers each repeated ×4 plus alias headers.
    Pins first-non-null left-to-right collapse and alias pick under the
    duplicate storm (SURVEY 'what's hard' #3)."""
    dup_names = ["Área Total", "Área Techada", "Precio m2", "Observación"]
    singles = [f"extra {i:02d}" for i in range(86 - 4 - 4 * len(dup_names))]
    header = (["codigo", "precio  lista", "estado", "Tipología"]
              + [n for n in dup_names for _ in range(4)] + singles)
    assert len(header) == 86

    def spread(v):          # dup group: blank, empty, then two values
        return [None, "", f"{v}-2", f"{v}-3"]

    row1 = (["101", "1.500,75", "Disponible", "A-1"]
            + sum((spread(n[:3]) for n in dup_names), [])
            + [""] * len(singles))
    row2 = (["102", "200", "Vendido", "B-2"]
            + sum(([None, None, None, f"{n[:3]}-last"] for n in dup_names), [])
            + [None] * len(singles))

    df = ingest_sheet(spark, [header, row1, row2], project="Matera",
                      header_row=0)
    assert len(df.columns) == len(set(df.columns))        # no dup names survive
    for c in (COL_NUMERO, COL_PRECIO, COL_ESTADO):        # aliases picked
        assert c in df.columns, c
    rows = {r[COL_NUMERO]: r for r in df.collect()}
    for n in dup_names:
        assert rows["101"][n] == f"{n[:3]}-2"   # first non-null left-to-right
        assert rows["102"][n] == f"{n[:3]}-last"
    assert rows["101"][COL_PRECIO] == 1500.75   # F4 parse survives the storm
    assert rows["102"][COL_PRECIO] == 200.0


def test_xlsx_roundtrip_and_e2e_ingest(spark, tmp_path):
    """S1 is EXECUTABLE, not a guard: a workbook generated by the stdlib
    writer round-trips through the stdlib zip+XML reader (typed cells,
    sparse gaps, second sheet, shared-string-free inline text), and the
    messy sheet flows through read_xlsx_rows → ingest_sheet end to end —
    the reference's pd.read_excel(...) → normalize path (APN:36)."""
    from precios_nexo_sperant_etl_spark.sources.excel import (read_xlsx_rows,
                                                              write_xlsx)
    path = str(tmp_path / "reporte.xlsx")
    write_xlsx(path, {"Precios": MESSY_SHEET,
                      "Tipos": [[1, 2.5, True, "ñandú & <xml>"],
                                [None, None, None, "gap row below"],
                                [],
                                [-3, 1e300, False, ""]]})

    # Typed round-trip on the second sheet (by name and by index).
    tipos = read_xlsx_rows(path, sheet_name="Tipos")
    assert tipos == read_xlsx_rows(path, sheet_name=1)
    assert tipos[0] == [1, 2.5, True, "ñandú & <xml>"]
    assert tipos[1] == [None, None, None, "gap row below"]
    assert tipos[2] == [None] * 4                       # empty physical row
    assert tipos[3][:3] == [-3, 1e300, False]

    # E2E: reader output drives the full ingest normalization.
    rows = read_xlsx_rows(path)                          # first sheet
    df = ingest_sheet(spark, rows, project="Matera")
    got = {r[COL_NUMERO]: r for r in df.collect()}
    assert set(got) == {"101.0", "102", "A103"}
    assert got["101.0"][COL_PRECIO] == 1000.50
    assert got["102"][COL_PRECIO] is None               # junk -> NULL
    assert got["101.0"]["Área Total"] == "55,5"         # dup-col collapse
