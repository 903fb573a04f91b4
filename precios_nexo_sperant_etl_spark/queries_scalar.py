"""Scalar-function queries (SURVEY §2.8 F-ops, §2.2 P11/P12) checked on
inline VALUES fixtures.

Each fixture is ONE Python literal table rendered both as a Spark
``createDataFrame`` and as a DuckDB ``VALUES`` clause, so the two sides
can never drift. These pin the reference's quirkiest semantics: the
mixed-separator number parser, the strictly-es-PE parser (including its
deliberate US-format mis-parse), int-like key canonicalization, the
tower-prefix masked update, and null-sentinel normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .functions.compare import isclose
from .functions.normalize import intlike_canon, norm_key
from .functions.numparse import NULL_SENTINELS, safe_num, to_number
from .operators.update import tower_prefix
from .registry import register
from .queries_scale_common import _sorted1


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _values_sql(rows, cols, types) -> str:
    """Render a literal table as a DuckDB FROM-clause subquery."""
    body = ",\n    ".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    sel = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    return f"(SELECT {sel} FROM (VALUES\n    {body}) t({', '.join(cols)}))"


def _string_df(spark: SparkSession, rows, cols) -> DataFrame:
    schema = StructType([StructField(c, StringType()) for c in cols])
    return spark.createDataFrame([tuple(r) for r in rows], schema)


# ---------------------------------------------------------------------------
# F4 — mixed-separator number parser (APN:104-128)
# ---------------------------------------------------------------------------

_F4_ROWS = [
    ("1.234.567,89",), ("1,234,567.89",), ("1,234",), ("1.234.567",),
    (" 416 881,11 ",), ("",), ("junk",), ("101.0",), ("-1.234,5",),
    ("1234",), (None,), ("12.5",), ("0,99",), ("1.000",), ("  7 ",),
    ("547000",), ("2,5,7",), (".5",), ("1.",),
]

register(
    "f4_to_number",
    lambda spark, sf: _string_df(spark, _F4_ROWS, ["raw"])
        .select(F.col("raw"), to_number(F.col("raw")).alias("parsed")),
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_F4_ROWS, ["raw"], ["VARCHAR"])}),
t AS (SELECT raw, regexp_replace(trim(raw), ' ', '', 'g') AS s FROM v)
SELECT raw,
  CASE
    WHEN s IS NULL OR s = '' THEN NULL
    WHEN contains(s, ',') AND contains(s, '.') THEN
      CASE WHEN strpos(reverse(s), ',') < strpos(reverse(s), '.')
        THEN TRY_CAST(replace(replace(s, '.', ''), ',', '.') AS DOUBLE)
        ELSE TRY_CAST(replace(s, ',', '') AS DOUBLE) END
    WHEN contains(s, ',') THEN TRY_CAST(replace(replace(s, '.', ''), ',', '.') AS DOUBLE)
    WHEN length(s) - length(replace(s, '.', '')) > 1 THEN
      TRY_CAST(replace(substr(s, 1, length(s) - strpos(reverse(s), '.')), '.', '')
               || '.' || substr(s, length(s) - strpos(reverse(s), '.') + 2) AS DOUBLE)
    ELSE TRY_CAST(s AS DOUBLE)
  END AS parsed
FROM t
""",
    doc="F4 _to_number decision tree: last separator wins; comma-only is decimal.",
)

# ---------------------------------------------------------------------------
# F5 — strictly es-PE parser with null sentinels (python_json.py:64-78)
# ---------------------------------------------------------------------------

_F5_ROWS = [
    ("1.234.567,89",), ("1,234.56",), ("NA",), ("#N/A",), ("-",), ("None",),
    ("null",), ("",), ("  42  ",), ("3,14",), ("1.000",), (None,), ("#ND",),
    ("N/A",), ("abc",),
]

_SENTINEL_SQL = ", ".join(_sql_lit(s) for s in NULL_SENTINELS)

register(
    "f5_safe_num",
    lambda spark, sf: _string_df(spark, _F5_ROWS, ["raw"])
        .select(F.col("raw"), safe_num(F.col("raw")).alias("parsed")),
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_F5_ROWS, ["raw"], ["VARCHAR"])}),
t AS (SELECT raw, trim(raw) AS s FROM v)
SELECT raw,
  CASE WHEN s IN ({_SENTINEL_SQL}) THEN NULL
       ELSE TRY_CAST(replace(replace(s, '.', ''), ',', '.') AS DOUBLE) END AS parsed
FROM t
""",
    doc="F5 _safe_num: sentinel→NULL then strict es-PE parse (mis-parses US format by design).",
)

# ---------------------------------------------------------------------------
# F6 — int-like unit-number canonicalization (APN:243-247)
# ---------------------------------------------------------------------------

_F6_ROWS = [
    ("101.0",), ("A101",), (" 202 ",), ("12.5",), ("0007",), ("B-3",),
    ("",), (None,), ("3.14.15",), ("999",),
]

register(
    "f6_intlike_canon",
    lambda spark, sf: _string_df(spark, _F6_ROWS, ["raw"])
        .select(F.col("raw"), intlike_canon(F.col("raw")).alias("canon")),
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_F6_ROWS, ["raw"], ["VARCHAR"])})
SELECT raw,
  CASE WHEN regexp_matches(raw, '^\\d+(\\.\\d+)?$')
       THEN CAST(CAST(trunc(CAST(raw AS DOUBLE)) AS BIGINT) AS VARCHAR)
       ELSE trim(raw) END AS canon
FROM v
""",
    doc="F6: digit-like strings → int string ('101.0'→'101'), else trimmed.",
)

# ---------------------------------------------------------------------------
# P11 — tower-prefix conditional masked update (APN:256-291)
# ---------------------------------------------------------------------------

_P11_ROWS = [
    ("Matera", "A-101", "101"),       # prefix applied → A101
    ("matera ", "B206", "206"),       # normalized project, B letter → B206
    ("Capadocia", "X-77", "301"),     # letter not in whitelist → unchanged
    ("Napoles", "a5", "A404"),        # already prefixed → unchanged
    ("Fenix", "A-1", "502"),          # project not masked → unchanged
    ("MATERA", "B2", "b33"),          # lowercase existing prefix counts (case-insens. guard)
    ("Matera", None, "606"),          # null typology → unchanged
    ("Matera", "A9", None),           # null unit → stays null-ish ("None"? no: null)
]

register(
    "p11_tower_prefix",
    lambda spark, sf: tower_prefix(
        _string_df(spark, _P11_ROWS, ["Proyecto", "Tipologia", "Numero"]),
        project_col="Proyecto", typology_col="Tipologia", unit_col="Numero"),
    f"""
WITH v AS (SELECT * FROM {_values_sql(_P11_ROWS, ["Proyecto", "Tipologia", "Numero"],
                                      ["VARCHAR", "VARCHAR", "VARCHAR"])}),
t AS (SELECT *,
        lower(trim(Proyecto)) IN ('capadocia','matera','napoles') AS proj_ok,
        upper(substr(trim(Tipologia), 1, 1)) AS letra,
        trim(Numero) AS num
      FROM v)
SELECT Proyecto, Tipologia,
  CASE WHEN proj_ok AND letra IN ('A','B')
            AND NOT regexp_matches(upper(num), '^[AB]\\d+$')
       THEN letra || num ELSE num END AS "Numero"
FROM t
""",
    doc="P11 idempotent tower-letter prefix for whitelisted projects.",
)

# ---------------------------------------------------------------------------
# O2 — numeric-aware "natural" sort (localeCompare numeric:true)
# ---------------------------------------------------------------------------

_O2_ROWS = [("A2",), ("A10",), ("B1",), ("a3",), ("10",), ("2",), ("A2B",),
            ("",), ("B-7",)]

def _o2(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.serve import natural_sort_keys
    from pyspark.sql import Window
    df = _string_df(spark, _O2_ROWS, ["raw"])
    w = Window.orderBy(*natural_sort_keys(F.col("raw")))
    return df.select("raw", F.row_number().over(w).alias("pos"))


register(
    "o2_natural_sort",
    _o2,
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_O2_ROWS, ["raw"], ["VARCHAR"])})
SELECT raw, CAST(ROW_NUMBER() OVER (ORDER BY
         lower(regexp_extract(raw, '^([^0-9]*)', 1)),
         COALESCE(TRY_CAST(regexp_extract(raw, '(\\d+)', 1) AS BIGINT), -1),
         raw) AS INT) AS pos
FROM v
""",
    doc="O2 natural sort: A2 < A10 via (alpha prefix, numeric value) keys.",
)

# ---------------------------------------------------------------------------
# O2 — full es-collation comparator (localeCompare "es" + numeric:true):
# ñ sorts as its own letter between n and o, accents tiebreak after the
# folded form, numbers compare by value.
# ---------------------------------------------------------------------------

_O2_ES_ROWS = [("niño 2",), ("nino 10",), ("niño 10",), ("Nino 1",),
               ("ñandú",), ("nube",), ("anzuelo",), ("añejo",), ("aorta",),
               ("ozono",), ("cafe",), ("café",), ("coco",),
               ("Torre Ñ-2",), ("Torre N-10",), ("Torre O-1",),
               ("A2",), ("A10",), ("á1",)]

def _o2_es(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.serve import es_natural_sort_keys
    from pyspark.sql import Window
    df = _string_df(spark, _O2_ES_ROWS, ["raw"])
    w = Window.orderBy(*es_natural_sort_keys(F.col("raw")))
    return df.select("raw", F.row_number().over(w).alias("pos"))


register(
    "o2_es_collation",
    _o2_es,
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_O2_ES_ROWS, ["raw"], ["VARCHAR"])}),
k AS (SELECT raw,
        lower(regexp_extract(raw, '^([^0-9]*)', 1)) AS low,
        COALESCE(TRY_CAST(regexp_extract(raw, '(\\d+)', 1) AS BIGINT), -1)
          AS num
      FROM v)
SELECT raw, CAST(ROW_NUMBER() OVER (ORDER BY
         translate(replace(low, 'ñ', 'n{{'),
                   'áàâäéèêëíìîïóòôöúùûüç', 'aaaaeeeeiiiioooouuuuc'),
         num, low, raw) AS INT) AS pos
FROM k
""",
    doc="O2 es collation: ñ is a letter between n and o (anzuelo < añejo "
        "< aorta), accents tiebreak secondarily (cafe < café), numbers "
        "by value — same key expressions on both engines.",
)

# ---------------------------------------------------------------------------
# F16 — numpy.isclose tolerance compare (APN:430-434)
# ---------------------------------------------------------------------------

_F16_ROWS = [
    (100.0, 100.0), (100.0, 100.0009), (100.0, 100.2), (None, None),
    (None, 5.0), (5.0, None), (0.0, 0.0), (0.0, 1e-9), (1e6, 1e6 + 5.0),
    (1e6, 1e6 + 50.0), (-3.5, -3.5000001),
]

register(
    "f16_isclose",
    lambda spark, sf: spark.createDataFrame(_F16_ROWS, "a double, b double")
        .select("a", "b", isclose(F.col("a"), F.col("b")).alias("close")),
    f"""
WITH v AS (SELECT a, b FROM {_values_sql(_F16_ROWS, ["a", "b"], ["DOUBLE", "DOUBLE"])})
SELECT a, b,
  CASE WHEN a IS NULL AND b IS NULL THEN TRUE
       ELSE COALESCE(abs(a - b) <= 1e-8 + 1e-5 * abs(b), FALSE) END AS close
FROM v
""",
    doc="F16 numpy.isclose(equal_nan=True): rtol 1e-5, atol 1e-8, NULL==NULL.",
)

# ---------------------------------------------------------------------------
# F1/F7/F10-F13/F17 — string ops bundle on customer
# ---------------------------------------------------------------------------

register(
    "string_ops_bundle",
    lambda spark, sf: _string_ops(spark, sf),
    """
SELECT c_custkey,
  lower(trim(c_name)) AS name_key,
  upper(substr(trim(c_mktsegment), 1, 1)) AS seg_letter,
  regexp_matches(c_name, '^Customer#\\d+$') AS name_ok,
  c_mktsegment IN ('BUILDING', 'MACHINERY') AS seg_in,
  c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_tag,
  c_mktsegment IS DISTINCT FROM upper(c_mktsegment) AS seg_changed
FROM customer
""",
    doc="F1 norm_key, F10 first-letter, F11 rlike, F12 isin, F13 concat, F17 null-safe neq.",
)


def _string_ops(spark: SparkSession, sf: str) -> DataFrame:
    from .sources.tables import load_tables
    c = load_tables(spark, sf)["customer"]
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        norm_key(F.col("c_name")).alias("name_key"),
        F.upper(F.substring(F.trim(seg), 1, 1)).alias("seg_letter"),
        F.col("c_name").rlike(r"^Customer#\d+$").alias("name_ok"),
        seg.isin("BUILDING", "MACHINERY").alias("seg_in"),
        F.concat(seg, F.lit("#"), F.col("c_nationkey").cast("string")).alias("seg_tag"),
        (~seg.eqNullSafe(F.upper(seg))).alias("seg_changed"),
    )


# ---------------------------------------------------------------------------
# P12 — null-sentinel normalization (python_json.py:72-73)
# ---------------------------------------------------------------------------

_P12_ROWS = [
    ("ok",), ("NA",), ("N/A",), ("#N/A",), ("#ND",), ("None",), ("null",),
    ("-",), ("",), ("  ",), ("0",), (None,),
]

register(
    "p12_null_sentinels",
    lambda spark, sf: _string_df(spark, _P12_ROWS, ["raw"]).select(
        F.col("raw"),
        F.when(F.trim(F.col("raw")).isin(*NULL_SENTINELS), F.lit(None).cast("string"))
         .otherwise(F.col("raw")).alias("cleaned")),
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_P12_ROWS, ["raw"], ["VARCHAR"])})
SELECT raw,
  CASE WHEN trim(raw) IN ({_SENTINEL_SQL}) THEN NULL ELSE raw END AS cleaned
FROM v
""",
    doc="P12: spreadsheet junk strings normalized to NULL.",
)


# ---------------------------------------------------------------------------
# F8 — to_datetime coercion (APN:137 pd.to_datetime(errors="coerce"))
# ---------------------------------------------------------------------------

_F8_ROWS = [
    ("2024-01-15",), ("2024-01-15 13:45:09",), ("15/01/2024",),
    ("2024-13-01",), ("31/02/2024",), ("pronto",), ("",), ("  ",),
    (None,), ("2024-02-29 00:00:00",), ("29/02/2023",), (" 2024-06-01 ",),
]


def _f8(spark: SparkSession, sf: str) -> DataFrame:
    from .functions.dates import to_datetime_coerce

    # Parsed TIMESTAMPs are LTZ; pin UTC so wall-times match the naive
    # DuckDB oracle even when this VALUES query runs on a fresh session
    # that never went through load_tables (which normally sets this).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _string_df(spark, _F8_ROWS, ["raw"]).select(
        F.col("raw"), to_datetime_coerce(F.col("raw")).alias("parsed"))


register(
    "f8_to_datetime",
    _f8,
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_F8_ROWS, ["raw"], ["VARCHAR"])})
SELECT raw,
  COALESCE(TRY_CAST(trim(raw) AS TIMESTAMP),
           try_strptime(trim(raw), '%d/%m/%Y')) AS parsed
FROM v
""",
    doc="F8 pd.to_datetime(errors='coerce'): ISO + es-PE dd/MM/yyyy; junk → NULL.",
)


# ---------------------------------------------------------------------------
# F3 — accent folding as a column op (the header cleaner's es-PE subset)
# ---------------------------------------------------------------------------

_F3_ROWS = [
    ("Número de inmueble",), ("Precio de lista",), ("tipología",),
    ("ÁREA TECHADA",), ("año",), ("señal única",), ("sin acentos",),
    ("ümlaut über",), ("",), (None,),
]

_ACCENTS = "áéíóúüñÁÉÍÓÚÜÑ"
_PLAIN = "aeiouunAEIOUUN"


register(
    "f3_accent_fold",
    lambda spark, sf: _string_df(spark, _F3_ROWS, ["raw"]).select(
        F.col("raw"), F.translate(F.col("raw"), _ACCENTS, _PLAIN).alias("folded")),
    f"""
WITH v AS (SELECT raw FROM {_values_sql(_F3_ROWS, ["raw"], ["VARCHAR"])})
SELECT raw, strip_accents(raw) AS folded FROM v
""",
    doc="F3 accent folding (á→a … ñ→n) as a codegen translate; DuckDB "
        "strip_accents agrees on the es-PE alphabet.",
)

# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys match
# each other instead of vanishing
# ---------------------------------------------------------------------------

_NSJ_LEFT = [("a", "1"), ("b", "2"), (None, "3"), ("d", "4")]
_NSJ_RIGHT = [("a", "x"), (None, "y"), ("c", "z")]


def _null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    left = _string_df(spark, _NSJ_LEFT, ["k", "lv"])
    right = _string_df(spark, _NSJ_RIGHT, ["k2", "rv"])
    return (left.join(right, left["k"].eqNullSafe(right["k2"]), "inner")
                .select("k", "lv", "rv").orderBy("lv"))


register(
    "null_safe_join",
    _null_safe_join,
    f"""
WITH l AS (SELECT k, lv FROM {_values_sql(_NSJ_LEFT, ["k", "lv"], ["VARCHAR", "VARCHAR"])}),
r AS (SELECT k2, rv FROM {_values_sql(_NSJ_RIGHT, ["k2", "rv"], ["VARCHAR", "VARCHAR"])})
SELECT l.k, l.lv, r.rv
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2
ORDER BY l.lv
""",
    doc="Null-safe equi-join: <=> (IS NOT DISTINCT FROM) lets NULL keys "
        "pair instead of dropping.",
)


# ---------------------------------------------------------------------------
# SCD2 merge — versioned-dimension twin of the F14 overwrite update
# ---------------------------------------------------------------------------

_SCD_DIM = [
    ("k1", "v1", "2024-01-01 00:00:00", None),
    ("k1", "v0", "2023-01-01 00:00:00", "2024-01-01 00:00:00"),
    ("k2", "a", "2024-01-01 00:00:00", None),
    ("k3", None, "2024-01-01 00:00:00", None),
]
_SCD_UPD = [
    ("k1", "v2", "2024-06-01 00:00:00"),   # changed → close + open
    ("k2", "a", "2024-06-01 00:00:00"),    # unchanged → no-op
    ("k3", "x", "2024-06-01 00:00:00"),    # NULL→value counts as change
    ("k4", "new", "2024-06-01 00:00:00"),  # new key → first version
    # two updates for one key in a single batch: only the LATEST becomes
    # the open version (the intermediate never became current)
    ("k5", "mid", "2024-05-01 00:00:00"),
    ("k5", "fin", "2024-06-01 00:00:00"),
]


def _scd2(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.update import scd2_merge
    dim = _string_df(spark, _SCD_DIM, ["k", "v", "effective_ts", "end_ts"]) \
        .select("k", "v",
                F.col("effective_ts").cast("timestamp_ntz").alias("effective_ts"),
                F.col("end_ts").cast("timestamp_ntz").alias("end_ts"))
    upd = _string_df(spark, _SCD_UPD, ["k", "v", "update_ts"]) \
        .select("k", "v",
                F.col("update_ts").cast("timestamp_ntz").alias("update_ts"))
    return (scd2_merge(dim, upd, ["k"], ["v"])
            .orderBy("k", "effective_ts"))


register(
    "scd2_merge",
    _scd2,
    f"""
WITH dim AS (SELECT * FROM {_values_sql(_SCD_DIM, ["k", "v", "effective_ts", "end_ts"],
                                        ["VARCHAR", "VARCHAR", "TIMESTAMP", "TIMESTAMP"])}),
u AS (SELECT k, v AS uv, update_ts AS uts
      FROM {_values_sql(_SCD_UPD, ["k", "v", "update_ts"],
                        ["VARCHAR", "VARCHAR", "TIMESTAMP"])}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY k
                                 ORDER BY update_ts DESC,
                                          v DESC NULLS LAST) = 1),
cur AS (SELECT * FROM dim WHERE end_ts IS NULL),
oldr AS (SELECT * FROM dim WHERE end_ts IS NOT NULL),
j AS (SELECT COALESCE(c.k, u.k) AS k, c.v, c.effective_ts, c.end_ts,
             u.uv, u.uts,
             (c.effective_ts IS NULL) AS is_new,
             (u.uts IS NOT NULL) AS has_u,
             (c.v IS DISTINCT FROM u.uv) AS chg
      FROM cur c FULL OUTER JOIN u ON c.k = u.k)
SELECT k, v, effective_ts, end_ts FROM oldr
UNION ALL
SELECT k, v, effective_ts, end_ts FROM j
WHERE NOT has_u OR (NOT is_new AND NOT chg)
UNION ALL
SELECT k, v, effective_ts, uts AS end_ts FROM j
WHERE has_u AND NOT is_new AND chg
UNION ALL
SELECT k, uv AS v, uts AS effective_ts, CAST(NULL AS TIMESTAMP) AS end_ts
FROM j WHERE has_u AND (is_new OR chg)
ORDER BY k, effective_ts
""",
    doc="SCD2 merge: close changed current rows, open new versions, "
        "keep history — null-safe change detection, full-outer on keys.",
)


# ---------------------------------------------------------------------------
# F22 — es-PE PEN currency formatting (reference
# html_con_datos/index.html:104-106, Intl.NumberFormat es-PE PEN with
# maximumFractionDigits: 0; null/NaN → "–"). Display-only in the
# reference; pinned here on a fixture covering grouping, the half-away
# tie at the integer boundary (both signs), null, and NaN.
# ---------------------------------------------------------------------------

_F22_ROWS = [
    (1, 0.0),
    (2, 1234.4),
    (3, 1234.5),          # tie: Intl halfExpand → 1,235
    (4, -1234.5),         # tie, negative: away from zero → -1,235
    (5, 12345678.89),     # multi-group
    (6, None),
    (8, 75.25),
]


def _f22_money(spark: SparkSession, sf: str) -> DataFrame:
    from .functions.currency import format_pen
    rows = _F22_ROWS + [(7, float("nan"))]
    df = spark.createDataFrame(rows, "id int, amount double")
    return (df.select("id", format_pen(F.col("amount")).alias("money_pen"))
              .orderBy("id"))


def _f22_oracle() -> str:
    from .functions.currency import duck_format_pen
    body = ",\n    ".join(
        f"({i}, {'NULL' if a is None else repr(a)})" for i, a in _F22_ROWS)
    return f"""
SELECT id, {duck_format_pen('amount')} AS money_pen
FROM (SELECT CAST(id AS INT) AS id, CAST(amount AS DOUBLE) AS amount
      FROM (VALUES
    {body},
    (7, CAST('NaN' AS DOUBLE))) t(id, amount))
ORDER BY id
"""


register(
    "f22_money_format",
    _f22_money,
    _f22_oracle(),
    doc="F22 es-PE PEN formatter: 'S/\\u00a0<comma-grouped integer>' "
        "with Intl's halfExpand rounding, null/NaN → '–'. Rounding "
        "happens on exact DECIMAL before formatting, so both engines "
        "format a plain integer.",
)


# ---------------------------------------------------------------------------
# mojibake_repair_audit (r11): the classic double-encoding corruption
# (UTF-8 bytes re-read as Latin-1 — the single most common mojibake in
# scraped corpora) synthesized, detected and REPAIRED entirely
# JVM-side with charset chains: corrupt = decode(encode(text, UTF-8),
# ISO-8859-1); repair = decode(encode(corrupt, ISO-8859-1), UTF-8).
# Pure codegen, no Python in the loop. The oracle pins the repaired
# md5 against the original text and the detection flag against the
# byte-length-vs-char-length identity, so a repair that loses even one
# byte fails the gate; `repaired_ok` is ASSERTED per row (a false
# anywhere breaks the value hash).
# ---------------------------------------------------------------------------

def _mojibake_repair(spark: SparkSession, sf: str) -> DataFrame:
    from .sources.tables import load_tables
    d = load_tables(spark, sf)["documents"]
    moji = F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1")
    repair = F.decode(F.encode(moji, "ISO-8859-1"), "UTF-8")
    return (d.select(
                "doc_id",
                (F.octet_length(F.col("text"))
                 != F.length(F.col("text"))).alias("has_non_ascii"),
                (moji != F.col("text")).alias("was_corrupted"),
                (repair == F.col("text")).alias("repaired_ok"),
                F.md5(F.encode(repair, "UTF-8")).alias("repaired_md5"))
            .transform(_sorted1, "doc_id"))


register(
    "mojibake_repair_audit",
    _mojibake_repair,
    """
SELECT doc_id,
       octet_length(encode(text)) != length(text) AS has_non_ascii,
       octet_length(encode(text)) != length(text) AS was_corrupted,
       TRUE AS repaired_ok,
       md5(text) AS repaired_md5
FROM documents ORDER BY doc_id
""",
    doc="Double-encoding mojibake synthesized and repaired with pure "
        "JVM charset chains; repaired md5 and detection flags "
        "oracle-asserted per document.",
)
