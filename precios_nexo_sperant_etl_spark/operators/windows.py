"""Event-time window operators over the ``events`` table: tumbling and
sliding aggregation (``F.window``) and gap-based sessionization
(``F.session_window``).

These run in batch here; ``streaming.stream_kpis`` runs the identical
aggregations under ``readStream`` with a watermark — same plan shape, so
the batch oracles also pin the streaming semantics. Window aggregation is
hash-agg on (key, window): partial-combinable, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import dsum


def tumbling_agg(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Per event-type counts + value sums in tumbling windows (epoch
    aligned, as ``F.window`` defines them)."""
    return (events.groupBy(F.window("ts", width).alias("win"), "event_type")
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       dsum(F.col("value")).alias("total_value"))
                  .select(F.col("win.start").alias("win_start"), "event_type",
                          "n_events", "total_value"))


def sliding_agg(events: DataFrame, width: str = "10 minutes",
                slide: str = "5 minutes") -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows."""
    return (events.groupBy(F.window("ts", width, slide).alias("win"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       dsum(F.col("value")).alias("total_value"))
                  .select(F.col("win.start").alias("win_start"),
                          "n_events", "total_value"))


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user via ``F.session_window``: a session
    starts at its first event; a quiet period longer than ``gap`` closes
    it. Output: one row per (user, session) with start, size, value sum."""
    return (events.groupBy("user_id", F.session_window("ts", gap).alias("win"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       dsum(F.col("value")).alias("total_value"))
                  .select("user_id", F.col("win.start").alias("session_start"),
                          "n_events", "total_value")
                  .repartition(1)
                  .sortWithinPartitions("user_id", "session_start"))


def funnel_counts(events: DataFrame, stages: tuple[str, ...] =
                  ("view", "click", "purchase"),
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Ordered funnel: how many users reached each stage IN ORDER —
    stage k counts a user only if their earliest stage-k event occurs at
    or after their earliest qualifying stage-(k-1) event.

    One shuffle on the user key, then one window pass per stage over the
    same partitioning (Spark chains the window execs without
    re-exchanging). Per-stage first-times are conditional ``min`` window
    aggregates — no joins, no self-unions, works unchanged at any event
    count per user.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        col = f"_t{i}"
        df = df.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    per_user = df.select(user_col, *[f"_t{i}" for i in range(len(stages))]) \
                 .distinct()
    aggs = [F.count(F.col(f"_t{i}")).alias(f"n_{stage}")
            for i, stage in enumerate(stages)]
    out = per_user.agg(*aggs)
    base = F.col(f"n_{stages[0]}")
    # pct stays UNROUNDED: long/long division is bit-identical in any
    # IEEE-754 engine, while bround on the dirty quotient can disagree
    # with an oracle's tie-breaking (see text.quality_expr).
    for i, stage in enumerate(stages[1:], start=1):
        out = out.withColumn(
            f"pct_{stage}", F.col(f"n_{stage}") / base)
    return out


def gapfill_locf(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 id_col: str = "event_id") -> DataFrame:
    """Hypertable-style daily gap-fill with last-observation-carried-
    forward: one row per (user, day) over the CORPUS day span, carrying
    each user's last observed daily-close ``value`` forward across days
    with no events; days before a user's first observation stay NULL
    (honest LOCF — no invented baseline).

    Scale shape: the grid is users × span-days built by broadcasting the
    tiny day spine into a cross join (never an explode over the fact
    table); the daily close is a combinable struct-max (deterministic —
    ``(ts, id)`` is unique); the LOCF window is per-user over day rows,
    so its state is O(span) per key regardless of event volume.
    """
    from pyspark.sql import Window
    span = events.agg(F.min(F.to_date(ts_col)).alias("d0"),
                      F.max(F.to_date(ts_col)).alias("d1"))
    days = span.select(F.explode(F.sequence("d0", "d1")).alias("d"))
    users = events.select(user_col).distinct()
    grid = users.crossJoin(F.broadcast(days))
    daily = (events.groupBy(user_col, F.to_date(ts_col).alias("d"))
             .agg(F.max(F.struct(ts_col, id_col, value_col)).alias("m"))
             .select(user_col, "d",
                     F.col(f"m.{value_col}").alias("close_value")))
    w = (Window.partitionBy(user_col).orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(daily, [user_col, "d"], "left")
            .select(user_col, "d",
                    F.col("close_value").isNotNull().alias("observed"),
                    F.last("close_value", ignorenulls=True).over(w)
                     .alias("filled_value")))
