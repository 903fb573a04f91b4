"""Incremental aggregate maintenance: mergeable partial rollups.

At 100 TB you never re-aggregate history — each load computes a rollup
of its increment and MERGES it into the stored rollup. That only works
for aggregates with associative, commutative merge functions
(count/sum/min/max; avg derived as sum/count at read time), which is
exactly the algebra Spark's own partial aggregation uses map-side. The
operators here expose that algebra at the table level, so a daily
pipeline is ``merge_rollups(stored, partial_rollup(new_batch))`` — one
combinable shuffle over the (tiny) rollup keyspace, never the history.

The registered query proves the algebra cross-engine: Spark computes
the rollup as two disjoint partials merged, the DuckDB oracle as one
single-pass aggregation — hash equality certifies that the merge is
lossless.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Measure schema produced by partial_rollup / consumed by merge_rollups.
_MEASURES = ("cnt", "total", "min_v", "max_v")


def partial_rollup(df: DataFrame, keys: Sequence[str],
                   val: str) -> DataFrame:
    """Mergeable partial aggregate of ``val`` per ``keys``:
    ``(keys..., cnt, total, min_v, max_v)``. ``val`` should already be
    an exact type (decimal/integer) — double sums would make the merge
    order-visible."""
    return (df.groupBy(*keys)
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.sum(val).alias("total"),
                   F.min(val).alias("min_v"),
                   F.max(val).alias("max_v")))


def merge_rollups(a: DataFrame, b: DataFrame,
                  keys: Sequence[str]) -> DataFrame:
    """Merge two partial rollups over the same keys: counts and sums
    add, min/max fold. Associative and commutative, so any number of
    increments in any order converge to the single-pass result."""
    u = a.unionByName(b)
    return (u.groupBy(*keys)
             .agg(F.sum("cnt").alias("cnt"),
                  F.sum("total").alias("total"),
                  F.min("min_v").alias("min_v"),
                  F.max("max_v").alias("max_v")))
