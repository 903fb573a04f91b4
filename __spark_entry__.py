"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``precios_nexo_sperant_etl_spark.registry``: every
implemented operator from SURVEY.md §2 registers a PySpark implementation
plus (where SQL-expressible) a DuckDB oracle. The driver runs
``entry(spark)`` as a smoke check and hash-compares each ``queries()``
entry against ``oracle_sql()`` at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from precios_nexo_sperant_etl_spark import registry
from precios_nexo_sperant_etl_spark.plans.price_pipeline import core_update_audit
from precios_nexo_sperant_etl_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    price-update pipeline (dedup → broadcast join → coalesce update →
    audit aggregation), per-nation summary rows."""
    configure(spark)
    return core_update_audit(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return registry.oracle_sql()
