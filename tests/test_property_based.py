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


def _bpe_ref(texts, n_merges):
    """Pure-Python BPE reference with the SAME documented semantics:
    frequency-weighted pair argmax, (count DESC, pair ASC) tie-break,
    two-pass non-overlapping replace merge (str.replace scans left to
    right exactly like SQL replace)."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                words[w] += 1
    syms = {w: " ".join(list(w)) for w in words}
    merges = []
    for r in range(n_merges):
        pc = Counter()
        for w, cnt in words.items():
            sp = syms[w].split(" ")
            for a, b in zip(sp, sp[1:]):
                pc[(a, b)] += cnt
        if not pc:
            break
        (p1, p2), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, p1, p2, p1 + p2, c))
        pat, rep = f" {p1} {p2} ", f" {p1}{p2} "
        for w in syms:
            s = f" {syms[w]} ".replace(pat, rep).replace(pat, rep)
            syms[w] = s.strip()
    return merges


@settings(**_SETTINGS)
@given(st.lists(
    st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
             min_size=1, max_size=12).map(" ".join),
    min_size=1, max_size=4))
def test_bpe_learn_matches_pure_python_reference(spark, texts):
    from precios_nexo_sperant_etl_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id int, text string")
    got = [tuple(r) for r in bpe_learn(docs, n_merges=3).collect()]
    assert got == _bpe_ref(texts, 3)
