"""Window-based deduplication and deterministic row ids
(reference W1, W2, W4 — SURVEY §2.6).

The reference relies on pandas' *physical row order* for its tiebreaks
(``sort_values`` is stable; ``drop_duplicates(keep="last")`` keeps the last
physical occurrence). A distributed engine has no physical order, so every
operator here takes an explicit, deterministic tiebreak column — at scale
this is a semantic requirement, not a style choice.

All of these shuffle once on the dedup keys; the window aggregation is
partial-pushdown friendly and AQE handles key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(df: DataFrame, keys: Sequence[str], order_col: str,
                      tiebreak: str | Column | None = None) -> DataFrame:
    """One row per key, the one with the greatest ``order_col`` winning.

    Mirrors ``_resolve_duplicates_sperant`` mode ``max_fecha``
    (Actualizar_Precios_de_Nexo.py:133-140): stable sort by date then keep
    the last. pandas sorts NaT last, so an *undated* row beats any dated
    row — reproduced with ``desc_nulls_first``. ``tiebreak`` replaces the
    reference's positional last-wins rule (use an ingest ordinal).
    """
    order = [F.col(order_col).desc_nulls_first()]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        order.append(tb.desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def dedup_keep_last(df: DataFrame, keys: Sequence[str],
                    ordinal: str | Sequence[str]) -> DataFrame:
    """One row per key, greatest ``ordinal`` wins (mode ``"ultimo"``, APN:141).

    The ordinal column(s) replace pandas' physical position (e.g. a
    ``row_number`` assigned at ingest over file name + in-file offset).
    Pass several columns when one alone is not a total order within a key.
    """
    ordinals = [ordinal] if isinstance(ordinal, str) else list(ordinal)
    w = Window.partitionBy(*keys).orderBy(*[F.col(o).desc() for o in ordinals])
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def add_row_id(df: DataFrame, order_by: Sequence[str | Column],
               name: str = "_rowid", num_partitions: int | None = None) -> DataFrame:
    """Dense, deterministic 0-based row id (APN:336 ``range(len(df))``)
    — the distributed two-pass ``zipWithIndex`` pattern, never a
    single-task global window.

    Plan: range-repartition on the order keys (global order across
    partitions, ties co-located), sort within partitions, then derive
    (partition, local-index) from ``monotonically_increasing_id``
    arithmetic (pid = id >> 33, consecutive local index = low 33 bits —
    a narrow op, no window, no extra shuffle). Per-partition counts are
    aggregated (tiny: one row per partition), turned into cumulative
    offsets, and broadcast-joined back: ``row_id = offset + local_index``.
    The fact table is shuffled exactly once (the range exchange, reused
    by both the count and the output branch); the only single-partition
    work is the offsets cumsum over ≤ ``num_partitions`` rows.

    The tagged frame is persisted (memory-and-disk) before the counts
    pass: ``repartitionByRange`` samples its boundaries with a fresh seed
    per execution, so without pinning the materialized partitioning the
    counts job and the output job would each re-sample and see
    *different* layouts (empirically: ~95% of ids wrong at sf0.01).
    Persisting is the same cost model as ``RDD.zipWithIndex`` — one
    materialization plus a tiny counts job — and is inherent to dense
    global ids; callers that only need uniqueness should use
    ``monotonically_increasing_id`` directly. The cache is dropped by
    the first action's GC or an explicit ``df.unpersist()`` upstream.
    """
    from pyspark import StorageLevel
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranged = (df.repartitionByRange(n, *order_cols)
                .sortWithinPartitions(*order_cols))
    # _mid gets its own projection: a stateful nondeterministic expression
    # referenced twice must be evaluated once (CollapseProject refuses to
    # inline it, so the derived pid/idx always read one shared value).
    tagged = (ranged
              .select("*", F.monotonically_increasing_id().alias("_mid"))
              .select("*",
                      F.shiftright(F.col("_mid"), 33).alias("_pid"),
                      F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)).alias("_idx"))
              .drop("_mid")
              .persist(StorageLevel.MEMORY_AND_DISK))
    counts = tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(cum), F.lit(0)).alias("_off"))
    # The id stays LONG: a 32-bit cast caps the table at ~2.1B rows and
    # throws under ANSI mode at exactly the scale this two-pass design
    # exists for. (The reference's range(len(df)) is a Python int — no
    # width contract to preserve.)
    return (tagged.join(F.broadcast(offsets), "_pid")
                  .withColumn(name, F.col("_off") + F.col("_idx"))
                  .drop("_pid", "_idx", "_off"))
