"""Multimodal plumbing and Structured Streaming equivalence tests."""

import hashlib

import pytest

from pyspark.sql import functions as F

from precios_nexo_sperant_etl_spark.operators.multimodal import (
    attach_binary, extract_features, real_decode_placeholder)
from precios_nexo_sperant_etl_spark.operators.windows import tumbling_agg
from precios_nexo_sperant_etl_spark.sources.tables import load_tables
from precios_nexo_sperant_etl_spark.streaming.stream_kpis import (
    run_available_now, stream_events, streaming_tumbling_counts)

SF_DIR = "/root/testdata/sf0.001"


def test_attach_binary_schema(spark):
    docs = spark.createDataFrame([(1, "héllo wörld")], "doc_id long, text string")
    out = attach_binary(docs).collect()[0]
    assert isinstance(out["payload"], (bytes, bytearray))
    assert out["meta"]["byte_len"] == len("héllo wörld".encode())


def test_extract_features_matches_hashlib(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta gamma")], "doc_id long, text string")
    feats = {r["doc_id"]: r for r in
             extract_features(attach_binary(docs)).collect()}
    for doc_id, text in [(1, "alpha"), (2, "beta gamma")]:
        raw = text.encode()
        r = feats[doc_id]
        assert r["byte_len"] == len(raw)
        assert r["fake_width"] == len(raw) % 640
        assert r["fake_height"] == len(raw) % 480
        assert r["content_md5"] == hashlib.md5(raw).hexdigest()


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode_placeholder(b"\x89PNG")


def test_streaming_matches_batch_tumbling(spark):
    """AvailableNow streaming run must agree with the batch plan for every
    window it emits (append mode withholds windows the final watermark
    hasn't passed — that is watermark semantics, not data loss)."""
    stream_rows = run_available_now(
        streaming_tumbling_counts(stream_events(spark, SF_DIR)))
    batch = {(r["win_start"], r["event_type"]): r["n_events"]
             for r in tumbling_agg(load_tables(spark, SF_DIR)["events"]).collect()}
    assert len(stream_rows) > 0
    for r in stream_rows:
        assert batch[(r["win_start"], r["event_type"])] == r["n_events"]
