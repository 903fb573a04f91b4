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
