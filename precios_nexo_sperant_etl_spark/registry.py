"""Registry of driver-checkable queries.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark_fn, oracle_sql)`` pair. ``spark_fn(spark, sf_dir) → DataFrame``
is the PySpark implementation; ``oracle_sql`` is the equivalent ANSI SQL
DuckDB runs on the same parquet tables. The driver hash-compares the two
at sf0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides
  (mixed-case aliases are double-quoted in the SQL);
- floating-point aggregations route through exact decimal accumulation
  (``functions.exact``) so values are bit-identical regardless of
  partitioning — see that module's docstring;
- queries with no SQL equivalent (streaming, iterative) register
  ``oracle_sql=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, fn: QueryFn, oracle: str | None, doc: str = "") -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # No try/except: a broken import here must fail loudly — swallowing it
    # would silently shrink queries()/oracle_sql() and the driver's
    # correctness gate would pass without checking the lost queries.
    from . import (queries_agg, queries_core, queries_joins,  # noqa: F401
                   queries_scalar, queries_scale)
    _LOADED = True
