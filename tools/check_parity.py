"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and
cell values exactly (sorted by column name, then by stringified row). Any
float that differs at all is reported with its max abs delta so
decimal-accumulation fixes can be targeted.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --vanilla [sf_dir] [query ...]

``--vanilla`` runs on an untuned SparkSession (default shuffle
partitions, no engine conf) — the closest local stand-in for the
driver's own session; results must be identical because every operator
is partition-independent by construction.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from precios_nexo_sperant_etl_spark.sources.tables import TABLES  # noqa: E402


# --- result-TYPE comparison -------------------------------------------------
# The driver's value-hash serializes the logical result type, so a DuckDB
# HUGEINT (un-cast SUM over integers) vs Spark BIGINT — or DECIMAL(38,2)
# vs DECIMAL(28,2) — fails the driver even when every value is equal.
# Round 4 shipped three such queries green locally; this mirror is now
# type-strict: both schemas are mapped to one canonical vocabulary and
# must match EXACTLY per column. Strictness over-approximates the driver
# (a flagged width mismatch just means "add a cast to the oracle"), which
# is the safe direction.

_DUCK_SCALAR = {
    "BOOLEAN": "boolean", "TINYINT": "tinyint", "SMALLINT": "smallint",
    "INTEGER": "int", "BIGINT": "bigint", "HUGEINT": "hugeint",
    "FLOAT": "float", "DOUBLE": "double", "VARCHAR": "string",
    "DATE": "date", "BLOB": "binary",
    # Naive-vs-zoned timestamp is a session-zone presentation detail both
    # engines agree on at the value level; collapse the variants.
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp", "TIMESTAMP_MS": "timestamp",
}


def _duck_canon(t) -> str:
    s = str(t).strip().upper()
    if s.endswith("[]"):
        return "array<" + _duck_canon(s[:-2]) + ">"
    if s.startswith("DECIMAL"):
        return s.lower().replace(" ", "")
    return _DUCK_SCALAR.get(s, s.lower())


def _spark_canon(dt) -> str:
    s = dt.simpleString()
    return "timestamp" if s in ("timestamp_ntz", "timestamp") else s


def compare_types(spark_df, rel):
    """Per-column canonical-type diff (by column name); [] if clean."""
    s_types = {f.name: _spark_canon(f.dataType) for f in spark_df.schema.fields}
    d_types = {c: _duck_canon(t) for c, t in zip(rel.columns, rel.types)}
    out = []
    for col in sorted(set(s_types) & set(d_types)):
        if s_types[col] != d_types[col]:
            out.append(f"types: col={col} spark={s_types[col]} "
                       f"duck={d_types[col]}")
    return out


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in data]
    out.sort(key=lambda r: tuple("\0" if c is None else str(c) for c in r))
    return [cols[i] for i in order], out


def compare(name, spark_df, con, sql):
    s_cols = spark_df.columns
    s_data = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_data = [tuple(r) for r in rel.fetchall()]

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    problems.extend(compare_types(spark_df, rel))
    if len(s_data) != len(d_data):
        problems.append(f"rowcount: spark={len(s_data)} duck={len(d_data)}")
    if not problems:
        _, s_rows = _rows(s_cols, s_data)
        _, d_rows = _rows(d_cols, d_data)
        n_bad, max_delta = 0, 0.0
        for sr, dr in zip(s_rows, d_rows):
            for a, b in zip(sr, dr):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        n_bad += 1
                        max_delta = max(max_delta, abs(a - b))
                else:
                    n_bad += 1
                    max_delta = float("inf")
        if n_bad:
            problems.append(f"values: {n_bad} cells differ, max_abs_delta={max_delta}")
    return problems


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if vanilla:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("parity-vanilla")
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
    else:
        spark = get_spark()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  ~ {name}: rows-only check, {n} rows [{time.time()-t0:.1f}s]")
                continue
            problems = compare(name, df, con, oracles[name])
        except Exception as ex:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(ex).__name__}: {ex}"]
        if problems:
            failed.append(name)
            print(f"  ✗ {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"  ✓ {name} [{time.time()-t0:.1f}s]")
        spark.catalog.clearCache()  # drop per-query persists between queries

    print(f"\n{len(failed)} failed" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
