"""Ingest-normalization layer: the reference's tolerant per-file logic
re-expressed at the DataFrame boundary.

Spark cannot represent duplicate or dirty column names post-hoc, so this
layer runs *before a DataFrame is born* (SURVEY §1.3): raw rows (from any
driver-side reader — xlrd, openpyxl, csv) pass through header detection
and name cleanup in plain Python (tiny, per-file, driver-side), then
become a DataFrame with positional columns that a named projection
collapses via ``coalesce`` — the engine-side analog of the reference's
``bfill(axis=1)`` duplicate-column handling.

The per-file Python here is O(header), not O(rows): all row data flows
into Spark untouched, so 100 TB of spreadsheet exports would still ingest
in parallel (one task per file via ``spark.createDataFrame`` per file, or
a binaryFile scan + mapInPandas for true cluster-side parsing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.normalize import clean_col_name
from ..functions.numparse import to_number

#: Canonical target columns (Actualizar_Precios_de_Nexo.py:55-57).
COL_NUMERO = "Número de inmueble"
COL_PRECIO = "Precio de lista"
COL_ESTADO = "Estado de inmueble"

#: Alias tables (Actualizar_Precios_de_Nexo.py:60-65).
ALIASES_NUMERO = [
    "Número de inmueble", "Numero de inmueble", "N° inmueble", "N° de inmueble",
    "numero", "número", "nombre", "nombre inmueble", "unidad", "codigo",
    "código", "Código de inmueble",
]
ALIASES_PRECIO = ["Precio de lista", "precio de lista", "precio", "precio lista",
                  "Precio Lista"]
ALIASES_ESTADO = ["Estado de inmueble", "estado de inmueble", "estado",
                  "estado comercial"]


def _norm(x) -> str | None:
    return str(x).strip().lower() if x is not None else None


def find_header_row(rows: Sequence[Sequence[object]],
                    candidates: Sequence[str] | None = None,
                    max_scan: int = 15) -> int | None:
    """Header auto-detection (S3, APN:84-91): scan the first ``max_scan``
    physical rows for any known alias string; that row is the header."""
    if candidates is None:
        candidates = ALIASES_NUMERO + ALIASES_PRECIO + ALIASES_ESTADO
    cand = {_norm(c) for c in candidates}
    for i, row in enumerate(rows[:max_scan]):
        if any(_norm(cell) in cand for cell in row):
            return i
    return None


def alias_pick(cols: Sequence[str], aliases: Sequence[str], canonical: str) -> str:
    """First present alias wins (APN:93-99)."""
    colset = set(cols)
    for a in aliases:
        if a in colset:
            return a
    return canonical


def ingest_sheet(spark: SparkSession, rows: Sequence[Sequence[object]],
                 project: str, header_row: int | None = None) -> DataFrame:
    """Reference ingest for one tolerantly-read sheet (APN:186-228):

    1. header detection (fallback: physical row 5, i.e. index 4)
    2. header cleanup (collapse whitespace)
    3. duplicate-name collapse: first non-null across same-named columns
       (``_collapse_duplicate_name``/``bfill``, APN:149-179) becomes a
       positional ``coalesce`` projection
    4. alias → canonical renames
    5. ensure target columns exist (null backfill, P4)
    6. price coercion via the F4 parser
    7. ``Proyecto`` literal + a deterministic ingest ordinal (``_ord``)
       replacing pandas' physical row order for downstream tiebreaks
    """
    hdr_idx = header_row if header_row is not None else find_header_row(rows)
    if hdr_idx is None:
        hdr_idx = 4
    header = [clean_col_name(c) for c in rows[hdr_idx]]
    data = [[None if c == "" else str(c) if c is not None else None for c in r]
            for r in rows[hdr_idx + 1:]]
    width = len(header)
    # The trailing long is the in-file ordinal — the deterministic stand-in
    # for pandas' physical row order (SURVEY §2.6 W4), assigned before the
    # rows are parallelized so no partitioning can change it.
    data = [list(r)[:width] + [None] * max(0, width - len(r)) + [i]
            for i, r in enumerate(data)]

    pos_schema = StructType(
        [StructField(f"_c{i}", StringType()) for i in range(width)]
        + [StructField("_ord", LongType())])
    raw = spark.createDataFrame(data, pos_schema)

    # duplicate-name collapse: first non-null left-to-right (F15/W3)
    seen: dict[str, list[int]] = {}
    for i, name in enumerate(header):
        seen.setdefault(name, []).append(i)
    named = raw.select(*([
        F.coalesce(*[F.col(f"_c{i}") for i in idxs]).alias(name) if len(idxs) > 1
        else F.col(f"_c{idxs[0]}").alias(name)
        for name, idxs in seen.items()
    ] + [F.col("_ord")]))

    ren = {}
    for aliases, canonical in ((ALIASES_NUMERO, COL_NUMERO),
                               (ALIASES_PRECIO, COL_PRECIO),
                               (ALIASES_ESTADO, COL_ESTADO)):
        picked = alias_pick(named.columns, aliases, canonical)
        if picked != canonical:
            ren[picked] = canonical
    for old, new in ren.items():
        named = named.withColumnRenamed(old, new)

    for c in (COL_NUMERO, COL_PRECIO, COL_ESTADO):
        if c not in named.columns:
            named = named.withColumn(c, F.lit(None).cast("string"))

    named = named.withColumn(COL_PRECIO, to_number(F.col(COL_PRECIO)))
    # The reference overwrites any pre-existing Proyecto column
    # (APN:233 ``df['Proyecto'] = project``); dropping first avoids a
    # duplicate column name that would make F.col('Proyecto') ambiguous.
    if "Proyecto" in named.columns:
        named = named.drop("Proyecto")
    return named.select(F.lit(project).alias("Proyecto"), "*")


def union_projects(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1 (APN:235): pandas-concat semantics — align on the union of
    column names, missing columns become NULL."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def ingest_project_files(spark: SparkSession, archivos: dict[str, str],
                         reader=None, header_row: int | None = None,
                         on_skip=None) -> DataFrame:
    """S5 tolerant fan-in (APN:186-230): per-project file map → one union.

    Mirrors the reference's error budget exactly:

    - missing path → warn and skip (``print(f"❌ No encontrado: ...")``)
    - per-file read/parse exception → warn and skip (the APN:229
      ``except Exception`` around the whole per-file block)
    - **zero** successful loads → ``RuntimeError`` (APN:231-232) — a
      silent empty union would let downstream stages "succeed" on
      nothing, which is the one failure the reference refuses to mask.

    ``reader(path) -> rows`` supplies the raw row matrix (defaults to the
    tolerant .xls shim; inject a fake for tests / other formats).
    ``on_skip(project, reason)`` observes skips (defaults to a log
    warning) so fleets can alert on degraded ingests rather than
    discovering them in the row counts.
    """
    import logging

    if reader is None:
        from .excel import read_xls_rows
        reader = read_xls_rows
    if on_skip is None:
        log = logging.getLogger(__name__)
        on_skip = lambda project, reason: log.warning(  # noqa: E731
            "skipping %s: %s", project, reason)

    import os

    loaded = []
    for project, path in archivos.items():
        if isinstance(path, str) and not os.path.exists(path):
            on_skip(project, f"not found: {path}")
            continue
        try:
            rows = reader(path)
            loaded.append(ingest_sheet(spark, rows, project, header_row))
        except Exception as ex:  # noqa: BLE001 — per-file tolerance is the op
            on_skip(project, f"{type(ex).__name__}: {ex}")
    if not loaded:
        raise RuntimeError(
            "No project file could be read — check paths and formats "
            "(reference: 'No se leyó ningún .xls')")
    return union_projects(loaded)


def drop_all_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P7 (python_json.py:130): remove rows where every column is null."""
    return df.na.drop(how="all", subset=list(subset) if subset else None)


def _parse_file_rows(rows: Sequence[Sequence[object]],
                     header_row: int | None) -> tuple[list[str], list[list]]:
    """The per-file half of :func:`ingest_sheet`, shaped for executors:
    header detect → clean names → positional duplicate collapse
    (first non-null left-to-right) → alias renames → in-file ordinal.
    Pure Python on ONE file's rows; returns (column names, row lists)."""
    hdr_idx = header_row if header_row is not None else find_header_row(rows)
    if hdr_idx is None:
        hdr_idx = 4
    header = [clean_col_name(c) for c in rows[hdr_idx]]
    width = len(header)
    seen: dict[str, list[int]] = {}
    for i, name in enumerate(header):
        seen.setdefault(name, []).append(i)
    ren = {}
    for aliases, canonical in ((ALIASES_NUMERO, COL_NUMERO),
                               (ALIASES_PRECIO, COL_PRECIO),
                               (ALIASES_ESTADO, COL_ESTADO)):
        picked = alias_pick(list(seen), aliases, canonical)
        if picked != canonical and picked in seen:
            ren[picked] = canonical
    names = [ren.get(n, n) for n in seen]
    out_rows = []
    for ordn, r in enumerate(rows[hdr_idx + 1:]):
        cells = [None if c == "" else str(c) if c is not None else None
                 for c in list(r)[:width]]
        cells += [None] * (width - len(cells))
        collapsed = []
        for idxs in seen.values():
            v = None
            for i in idxs:
                if cells[i] is not None:
                    v = cells[i]
                    break
            collapsed.append(v)
        out_rows.append(collapsed + [ordn])
    return names, out_rows


def ingest_project_files_distributed(spark: SparkSession,
                                     archivos: dict[str, str],
                                     reader=None,
                                     header_row: int | None = None,
                                     on_skip=None) -> DataFrame:
    """S5 fan-in at fleet scale: same tolerant semantics as
    :func:`ingest_project_files` (missing path / per-file parse error →
    warn and skip; zero successes → ``RuntimeError``) but the file
    parsing runs ON EXECUTORS, one task per file, so 1 000 workbook
    exports ingest in parallel instead of a driver-side loop.

    Mechanics: the (project, path) list is parallelized with one
    partition per file; each task reads + header-normalizes its file
    (:func:`_parse_file_rows` — the same logic ``ingest_sheet`` runs)
    and yields tagged records. The parsed RDD is persisted once, a
    NAMES-ONLY pass collects the union of column name lists (bounded
    by header width × distinct layouts, never row data), then the row
    pass aligns every file to that union (pandas-concat semantics, U1)
    and becomes one DataFrame. Skip reports ride the same cached pass.

    The driver-loop variant stays for small interactive runs; tests
    pin that both produce identical rows."""
    import logging

    if reader is None:
        from .excel import read_xls_rows
        reader = read_xls_rows
    if on_skip is None:
        log = logging.getLogger(__name__)
        on_skip = lambda project, reason: log.warning(  # noqa: E731
            "skipping %s: %s", project, reason)

    import os

    items = []
    for project, path in archivos.items():
        if isinstance(path, str) and not os.path.exists(path):
            on_skip(project, f"not found: {path}")
            continue
        items.append((project, path))
    if not items:
        raise RuntimeError(
            "No project file could be read — check paths and formats "
            "(reference: 'No se leyó ningún .xls')")

    hdr = header_row

    def parse_one(item):
        project, path = item
        try:
            names, rows = _parse_file_rows(reader(path), hdr)
            return ("ok", project, names, rows)
        except Exception as ex:  # noqa: BLE001 — per-file tolerance is the op
            return ("skip", project, f"{type(ex).__name__}: {ex}", None)

    sc = spark.sparkContext
    parsed = sc.parallelize(items, numSlices=len(items)).map(parse_one)
    parsed.persist()
    try:
        # names-only pass: tiny driver traffic (no row data)
        metas = parsed.map(lambda t: (t[0], t[1], t[2] if t[0] == "skip"
                                      else tuple(t[2]))).collect()
        all_names: list[str] = []
        seen_names: set[str] = set()
        n_ok = 0
        for tag, project, info in metas:
            if tag == "skip":
                on_skip(project, info)
                continue
            n_ok += 1
            for n in info:
                if n not in seen_names:
                    seen_names.add(n)
                    all_names.append(n)
        if not n_ok:
            raise RuntimeError(
                "No project file could be read — check paths and formats "
                "(reference: 'No se leyó ningún .xls')")
        for c in (COL_NUMERO, COL_PRECIO, COL_ESTADO):
            if c not in seen_names:
                seen_names.add(c)
                all_names.append(c)

        # APN:233 semantics: the map key OVERWRITES any in-file
        # Proyecto column, so that name never enters the union
        target = [n for n in all_names if n != "Proyecto"]

        def align(t):
            if t[0] != "ok":
                return
            _, project, names, rows = t
            pos = {n: i for i, n in enumerate(names)}
            idxs = [pos.get(n) for n in target]
            for r in rows:
                yield tuple(
                    [project]
                    + [None if i is None else r[i] for i in idxs]
                    + [r[-1]])

        out_schema = StructType(
            [StructField("Proyecto", StringType())]
            + [StructField(n, StringType()) for n in target]
            + [StructField("_ord", LongType())])
        df = spark.createDataFrame(parsed.flatMap(align), out_schema)
        # Materialize ONCE before releasing the parsed cache:
        # createDataFrame over an RDD is lazy, so unpersisting here
        # without this would make every caller action re-read and
        # re-parse all files. localCheckpoint pins the aligned rows in
        # executor storage and truncates the lineage back to the
        # Python parse closures.
        df = df.localCheckpoint(eager=True)
        return df.withColumn(COL_PRECIO, to_number(F.col(COL_PRECIO)))
    finally:
        parsed.unpersist()
