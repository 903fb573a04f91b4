"""Excel reading shims (reference S1/S2 — SURVEY §2.1).

Spark has no native Excel source; the reference reads legacy ``.xls`` with
xlrd (corruption-tolerant) and ``.xlsx`` with pandas/openpyxl. These shims
produce the raw row matrix that :func:`..ingest.ingest_sheet` normalizes —
so the *engine* never depends on Excel libraries, and environments without
them (like this one) fail with a clear message only when Excel input is
actually requested.

At real scale, spreadsheet fleets should be read cluster-side: a
``binaryFile`` scan + ``mapInPandas`` calling these same per-file readers,
one task per workbook.
"""

from __future__ import annotations


def read_xls_rows(path: str) -> list[list[object]]:
    """Tolerant legacy-BIFF read (APN:191-193): first sheet, all cells,
    workbook corruption ignored."""
    try:
        import xlrd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "xlrd is not installed in this environment; install it (or read "
            "the sheet with any tool producing a row matrix) and feed "
            "ingest_sheet() directly") from e
    import os
    book = xlrd.open_workbook(path, logfile=open(os.devnull, "w"),
                              ignore_workbook_corruption=True)
    sheet = book.sheet_by_index(0)
    return [sheet.row_values(r) for r in range(sheet.nrows)]


def read_xlsx_rows(path: str, sheet_name: int | str = 0) -> list[list[object]]:
    """Modern ``.xlsx`` read (APN:36) via openpyxl."""
    try:
        import openpyxl
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "openpyxl is not installed in this environment; install it (or "
            "convert the workbook to parquet/csv) and feed ingest_sheet() "
            "directly") from e
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    ws = wb[sheet_name] if isinstance(sheet_name, str) else wb.worksheets[sheet_name]
    return [list(row) for row in ws.iter_rows(values_only=True)]
