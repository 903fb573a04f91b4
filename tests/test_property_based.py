"""Property-based cross-checks (hypothesis): the distributed operators
must agree with trivially-correct pure-Python references on arbitrary
inputs, not just the hand-picked fixtures."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.graph import (
    connected_components)
from precios_nexo_sperant_etl_spark.operators.packing import pack_sequences
from precios_nexo_sperant_etl_spark.operators.serve import hash_split

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # fully compress: label = min of component
    return {n: find(n) for n in parent}


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=60))
def test_connected_components_matches_union_find(spark, edges):
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(pairs, max_iter=60).collect()}
    assert got == _union_find(edges)


def _greedy(items, budget):
    out, seq, fill = {}, 0, 0
    for i, t in sorted(items):
        if fill > 0 and fill + t > budget:
            seq, fill = seq + 1, 0
        fill += t
        out[i] = (seq, fill)
    return out


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 700), min_size=1, max_size=50))
def test_pack_sequences_matches_reference_greedy(spark, tokens):
    items = list(enumerate(tokens))
    df = spark.createDataFrame([("g", i, t) for i, t in items],
                               "lang string, doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["seq_id"], r["seq_fill"])
           for r in pack_sequences(df, budget=512).collect()}
    assert got == _greedy(items, 512)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=80,
                unique=True))
def test_hash_split_total_and_stable(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = hash_split(df).collect()
    assert len(rows) == len(ids)                      # total function
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    again = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)  # stable
