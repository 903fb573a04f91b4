"""Boundary-semantics tests for the temporal joins (as-of, banded range)."""

import datetime as dt

from precios_nexo_sperant_etl_spark.operators.temporal import (asof_join,
                                                               range_join_within)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_boundaries(spark):
    left = spark.createDataFrame(
        [("u", _ts(0), "before_any"), ("u", _ts(10), "at_equal"),
         ("u", _ts(25), "between"), ("v", _ts(100), "other_key")],
        "k string, ts timestamp, tag string")
    right = spark.createDataFrame(
        [("u", _ts(10), 1.0), ("u", _ts(20), 2.0)],
        "k string, p_ts timestamp, p_value double")
    out = {r["tag"]: r for r in
           asof_join(left, right, on=["k"], left_ts="ts", right_ts="p_ts",
                     right_vals=["p_value"]).collect()}
    assert out["before_any"]["asof_p_value"] is None      # nothing precedes
    assert out["at_equal"]["asof_p_value"] == 1.0         # <= includes equal ts
    assert out["between"]["asof_p_value"] == 2.0          # latest preceding wins
    assert out["other_key"]["asof_p_value"] is None       # keys don't leak


def test_range_join_within_gap_boundary(spark):
    a = spark.createDataFrame([("u", _ts(0)), ("u", _ts(1000))],
                              "k string, ts_a timestamp")
    b = spark.createDataFrame(
        [("u", _ts(600)), ("u", _ts(601)), ("u", _ts(999))],
        "k string, ts_b timestamp")
    pairs = {(r["ts_a"], r["ts_b"]) for r in
             range_join_within(a, b, on=["k"], a_ts="ts_a", b_ts="ts_b",
                               max_gap_s=600).collect()}
    assert (_ts(0), _ts(600)) in pairs          # inclusive boundary
    assert (_ts(0), _ts(601)) not in pairs      # just outside
    assert (_ts(1000), _ts(601)) in pairs       # symmetric (|diff| = 399)
    assert (_ts(1000), _ts(999)) in pairs


def test_gapfill_locf_semantics(spark):
    """Grid covers the corpus span; values carry forward across silent
    days; days before a user's first event stay NULL; the daily close is
    the (ts, event_id)-max event of the day."""
    from precios_nexo_sperant_etl_spark.operators.windows import gapfill_locf
    t = dt.datetime
    rows = [
        # user 1: two events day 1 (close = later one), silent day 2,
        # event day 3
        (1, t(2024, 1, 1, 9), 1, 10.0),
        (2, t(2024, 1, 1, 18), 1, 20.0),
        (3, t(2024, 1, 3, 12), 1, 30.0),
        # user 2: first event only on day 2 -> day 1 unfilled
        (4, t(2024, 1, 2, 8), 2, 99.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {(r["user_id"], str(r["d"])): (r["observed"], r["filled_value"])
           for r in gapfill_locf(events).collect()}
    assert len(got) == 6  # 2 users x 3-day span
    assert got[(1, "2024-01-01")] == (True, 20.0)   # later event wins
    assert got[(1, "2024-01-02")] == (False, 20.0)  # carried forward
    assert got[(1, "2024-01-03")] == (True, 30.0)
    assert got[(2, "2024-01-01")] == (False, None)  # before first obs
    assert got[(2, "2024-01-02")] == (True, 99.0)
    assert got[(2, "2024-01-03")] == (False, 99.0)


def test_gapfill_locf_daily_close_tiebreak(spark):
    """Two events at the SAME timestamp: the higher event_id wins —
    the struct-max tie-break the oracle's ROW_NUMBER mirrors."""
    from precios_nexo_sperant_etl_spark.operators.windows import gapfill_locf
    t = dt.datetime
    events = spark.createDataFrame(
        [(7, t(2024, 5, 5, 12), 1, 1.0), (8, t(2024, 5, 5, 12), 1, 2.0)],
        "event_id long, ts timestamp, user_id long, value double")
    [row] = gapfill_locf(events).collect()
    assert row["filled_value"] == 2.0
