"""Excel reading/writing without Excel libraries (reference S1/S2 —
SURVEY §2.1).

Spark has no native Excel source; the reference reads legacy ``.xls``
with xlrd (corruption-tolerant) and ``.xlsx`` with pandas/openpyxl
(``Actualizar_Precios_de_Nexo.py:36,191``). An ``.xlsx`` is just a ZIP
of XML parts (ECMA-376, a public format), so the modern path here is a
dependency-free stdlib reader/writer: ``zipfile`` + ``ElementTree``.
Only the legacy BIFF ``.xls`` path still needs xlrd (binary format,
not worth reimplementing) and keeps its loud environment guard.

These functions produce/consume the raw row matrix that
:func:`..ingest.ingest_sheet` normalizes — the *engine* never depends
on Excel libraries.

At real scale, spreadsheet fleets should be read cluster-side: a
``binaryFile`` scan + ``mapInPandas`` calling these same per-file
readers, one task per workbook (each workbook is one self-contained
blob, so the parse parallelizes per file).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_NS_PKG = ("{http://schemas.openxmlformats.org/package/2006/"
           "relationships}")


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


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC12' → 54: base-26 letters of the A1 reference."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ElementTree.fromstring(data).iter(f"{_NS}si"):
        # Plain <t> or rich-text runs <r><t>…</t></r>: concatenate all
        # descendant <t> text, which covers both shapes.
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, zip path) in workbook order, resolved through the
    relationship part — sheet order in workbook.xml is display order,
    and the r:id → target mapping lives in workbook.xml.rels."""
    rels = {}
    for rel in ElementTree.fromstring(
            zf.read("xl/_rels/workbook.xml.rels")).iter(f"{_NS_PKG}Relationship"):
        target = rel.get("Target")
        if target.startswith("/"):
            target = target.lstrip("/")
        else:
            target = "xl/" + target
        rels[rel.get("Id")] = target
    sheets = []
    for sh in ElementTree.fromstring(
            zf.read("xl/workbook.xml")).iter(f"{_NS}sheet"):
        sheets.append((sh.get("name"), rels[sh.get(f"{_NS_REL}id")]))
    return sheets


def _cell_value(c: ElementTree.Element, shared: list[str]) -> object:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t in ("str", "e"):
        return v.text
    if t == "b":
        return v.text == "1"
    # Numeric: int when the serialized form is integral (what openpyxl
    # yields for whole numbers), float otherwise. Date cells arrive as
    # their raw serial number — this reader ignores number-format styles;
    # ingest_sheet stringifies values anyway.
    txt = v.text
    if re.fullmatch(r"-?\d+", txt):
        return int(txt)
    return float(txt)


def read_xlsx_rows(path: str, sheet_name: int | str = 0) -> list[list[object]]:
    """Modern ``.xlsx`` read (APN:36) — dependency-free: ZIP + worksheet
    XML + shared-string table, no openpyxl. Returns a dense row matrix
    (gaps from sparse cell references become ``None``), the same shape
    openpyxl's ``iter_rows(values_only=True)`` produces.
    """
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_paths(zf)
        if isinstance(sheet_name, str):
            match = [p for n, p in sheets if n == sheet_name]
            if not match:
                raise KeyError(
                    f"sheet {sheet_name!r} not in {[n for n, _ in sheets]}")
            part = match[0]
        else:
            part = sheets[sheet_name][1]
        shared = _shared_strings(zf)
        rows: list[list[object]] = []
        for row_el in ElementTree.fromstring(
                zf.read(part)).iter(f"{_NS}row"):
            # Physical row index from r= (1-based); pad skipped rows so
            # header_row indices refer to the same physical rows Excel
            # shows.
            r_attr = row_el.get("r")
            r_idx = int(r_attr) - 1 if r_attr else len(rows)
            while len(rows) < r_idx:
                rows.append([])
            cells: list[object] = []
            for c in row_el.iter(f"{_NS}c"):
                ref = c.get("r")
                ci = _col_index(ref) if ref else len(cells)
                while len(cells) < ci:
                    cells.append(None)
                cells.append(_cell_value(c, shared))
            rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def _col_letter(idx: int) -> str:
    """0 → 'A', 54 → 'BC'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def write_xlsx(path: str, sheets: dict[str, list[list[object]]]) -> None:
    """Minimal dependency-free ``.xlsx`` writer: numbers/bools as native
    cells, everything else as inline strings. Enough for the audit
    workbook artifacts (S7/S8) and for round-trip tests of
    :func:`read_xlsx_rows`; deliberately no styles/formulas/dates.
    """
    ct_overrides = []
    wb_sheets = []
    rels = []
    parts: dict[str, str] = {}
    for i, (name, rows) in enumerate(sheets.items(), start=1):
        part = f"xl/worksheets/sheet{i}.xml"
        ct_overrides.append(
            f'<Override PartName="/{part}" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>')
        wb_sheets.append(
            f'<sheet name="{_xml_escape(str(name))}" sheetId="{i}" '
            f'r:id="rId{i}"/>')
        rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>')
        xml_rows = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_col_letter(ci)}{ri}"
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="inlineStr"><is><t '
                                 'xml:space="preserve">'
                                 f'{_xml_escape(str(v))}</t></is></c>')
            xml_rows.append(f'<row r="{ri}">{"".join(cells)}</row>')
        parts[part] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(xml_rows) + "</sheetData></worksheet>")

    parts["[Content_Types].xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(ct_overrides) + "</Types>")
    parts["_rels/.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')
    parts["xl/workbook.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        + "".join(wb_sheets) + "</sheets></workbook>")
    parts["xl/_rels/workbook.xml.rels"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">' + "".join(rels) + "</Relationships>")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for part, content in parts.items():
            zf.writestr(part, content)
