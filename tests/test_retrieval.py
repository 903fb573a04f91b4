"""Hybrid retrieval: RRF fusion semantics and the sparse inverted-index
ranking's pruning/scoring invariants."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from precios_nexo_sperant_etl_spark.operators.retrieval import (
    rrf_fuse, sparse_overlap_topk)

SF_DIR = "/root/testdata/sf0.001"


def test_rrf_both_lists_beat_single_list(spark):
    # cand 10 is rank 2 in BOTH lists; cand 11/12 are rank 1 in exactly
    # one. 1/62+1/62 > 1/61 -> the doubly-ranked candidate must fuse first.
    a = spark.createDataFrame([Row(query_id=1, neighbor_id=11, rank=1),
                               Row(query_id=1, neighbor_id=10, rank=2)])
    b = spark.createDataFrame([Row(query_id=1, neighbor_id=12, rank=1),
                               Row(query_id=1, neighbor_id=10, rank=2)])
    out = rrf_fuse(a, b, k0=60, topk=10).collect()
    assert [r.neighbor_id for r in out] == [10, 11, 12]
    assert out[0].fused_rank == 1
    # missing ranking contributes exactly 0
    assert out[1].rrf_score == 1.0 / 61
    # ties (11 vs 12 both score 1/61) break by neighbor id
    assert [r.neighbor_id for r in out if r.rrf_score == 1.0 / 61] == [11, 12]


def test_sparse_overlap_prunes_high_df_terms(spark):
    # "the" appears in every doc -> pruned at df*10 <= N (N=20); the rare
    # shared term drives the ranking.
    rows = [Row(doc_id=i, text=f"the unique{i} word{i % 2}")
            for i in range(20)]
    docs = spark.createDataFrame(rows)
    out = sparse_overlap_topk(docs, [0], k=5).collect()
    # probe 0 has tokens {the, unique0, word0}; 'the' pruned (df=20),
    # 'word0' kept (df=10, 10*10 <= 20 is false) -> also pruned; so no
    # candidates at all with the default denominator.
    assert out == []
    # with a laxer prune, word0 (df=10) survives and matches the even docs
    out2 = sparse_overlap_topk(docs, [0], k=50, df_prune_den=1).collect()
    evens = {r.neighbor_id for r in out2 if r.overlap >= 1}
    assert {2, 4, 6, 8} <= evens
    # ranking: overlap desc then id asc, ranks are 1..n
    ranks = [r.rank for r in out2]
    assert ranks == sorted(ranks) == list(range(1, len(out2) + 1))


def test_hybrid_query_shape_on_fixture(spark):
    from precios_nexo_sperant_etl_spark.queries_retrieval import _rrf_hybrid
    out = _rrf_hybrid(spark, SF_DIR).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.fused_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        # fused score is monotone non-increasing down the list
        scores = [r.rrf_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        # every fused candidate came from at least one list
        assert all(r.dense_rank is not None or r.sparse_rank is not None
                   for r in rs)


def test_negative_samples_cross_source_and_complete(spark):
    from precios_nexo_sperant_etl_spark.operators.retrieval import \
        negative_samples
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = negative_samples(docs, n_buckets=16, k=2).collect()
    n = docs.count()
    # every anchor gets exactly k draw rows
    assert len(out) == 2 * n
    for r in out:
        if r.neg_id is not None:
            # the contract: a negative never shares the anchor's source
            assert r.neg_strat != r.anchor_strat
            assert r.neg_id != r.anchor_id
    # with 16 buckets over this corpus no draw should be NULL
    assert all(r.neg_id is not None for r in out)
    # deterministic: a second run returns the identical draw table
    again = negative_samples(docs, n_buckets=16, k=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_single_source_yields_null_draws(spark):
    from pyspark.sql import Row
    from precios_nexo_sperant_etl_spark.operators.retrieval import \
        negative_samples
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="only") for i in range(20)])
    out = negative_samples(docs, n_buckets=4, k=1).collect()
    # no cross-source candidate exists anywhere: every draw must be a
    # reported NULL, never a same-source "negative"
    assert len(out) == 20
    assert all(r.neg_id is None for r in out)


# --- property: sparse ranking matches a pure-Python reference -------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]
_DOCS = st.lists(st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
                 min_size=2, max_size=14)


def _ref_sparse(texts, probe_ids, k, den, ngram):
    def terms(words):
        if ngram == 1:
            return set(words)
        return {f"{a} {b}" for a, b in zip(words, words[1:])}

    tsets = {i: terms(t.split()) for i, t in enumerate(texts)}
    n = len(texts)
    df = {}
    for s in tsets.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    kept = {t for t, c in df.items() if c * den <= n}
    out = []
    for q in probe_ids:
        scored = sorted(
            ((len(tsets[q] & tsets[d] & kept), d) for d in tsets if d != q),
            key=lambda x: (-x[0], x[1]))
        rank = 0
        for ov, d in scored:
            if ov == 0:
                break
            rank += 1
            if rank > k:
                break
            out.append((q, d, ov, rank))
    return sorted(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_DOCS, den=st.sampled_from([1, 2, 4]),
       ngram=st.sampled_from([1, 2]))
def test_sparse_overlap_matches_reference(spark, docs, den, ngram):
    texts = [" ".join(w) for w in docs]
    frame = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    probes = [0, 1]
    got = sorted((r.query_id, r.neighbor_id, r.overlap, r.rank)
                 for r in sparse_overlap_topk(frame, probes, k=3,
                                              df_prune_den=den,
                                              ngram=ngram).collect())
    assert got == _ref_sparse(texts, probes, 3, den, ngram)


_RANKED = st.lists(
    st.tuples(st.integers(0, 1), st.integers(10, 25)),
    min_size=0, max_size=12, unique=True)


def _ref_rrf(a, b, k0, topk):
    # a/b: {(q, n): rank}; fused score with missing side contributing 0
    cands = set(a) | set(b)
    out = []
    for q in {qn[0] for qn in cands}:
        scored = sorted(
            ((1.0 / (k0 + a[(q, n)]) if (q, n) in a else 0.0)
             + (1.0 / (k0 + b[(q, n)]) if (q, n) in b else 0.0), -n)
            for qq, n in cands if qq == q for n in [n])
        scored.reverse()
        for fr, (s, negn) in enumerate(scored[:topk], 1):
            out.append((q, -negn, s, fr))
    return sorted(out)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(la=_RANKED, lb=_RANKED)
def test_rrf_fuse_matches_reference(spark, la, lb):
    # build rank lists: per query, ranks 1..n in the given neighbor order
    def ranks(lst):
        seen, rows = {}, {}
        for q, n in lst:
            seen[q] = seen.get(q, 0) + 1
            rows[(q, n)] = seen[q]
        return rows

    ra, rb = ranks(la), ranks(lb)
    mk = lambda rows: spark.createDataFrame(
        [(q, n, r) for (q, n), r in rows.items()] or [(None, None, None)],
        "query_id long, neighbor_id long, rank long").dropna()
    got = sorted((r.query_id, r.neighbor_id, r.rrf_score, r.fused_rank)
                 for r in rrf_fuse(mk(ra), mk(rb), k0=60, topk=5).collect())
    want = _ref_rrf(ra, rb, 60, 5)
    assert [(g[0], g[1], g[3]) for g in got] == [(w[0], w[1], w[3])
                                                 for w in want]
    for g, w in zip(got, want):
        assert g[2] == w[2]  # bit-exact: same two divisions, same sum order


def test_bm25_matches_pure_python_reference(spark):
    """bm25_topk (r11) against an independent eager-Python Okapi BM25
    over the same bigram/len/df definitions — rank list and quantized
    scores must agree exactly."""
    import math

    from precios_nexo_sperant_etl_spark.operators.retrieval import (
        bm25_topk)

    texts = {
        0: "red fox jumps over the lazy dog near the red barn",
        1: "red fox sleeps under a barn roof every day",
        2: "lazy dog and red fox share the barn",
        3: "quick brown fox jumps high",
        4: "the cat sleeps all day in the sun",
        5: "dog barks at the cat near the sun porch",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")

    def bigrams(t):
        w = t.split()
        return [f"{a} {b}" for a, b in zip(w, w[1:])]

    n = len(texts)
    tf = {i: {} for i in texts}
    for i, t in texts.items():
        for g in bigrams(t):
            tf[i][g] = tf[i].get(g, 0) + 1
    df = {}
    for i in texts:
        for g in tf[i]:
            df[g] = df.get(g, 0) + 1
    kept = {g for g, d in df.items() if d * 10 <= n}
    dl = {i: len(bigrams(t)) for i, t in texts.items()}
    avgdl = sum(dl.values()) / len(dl)

    def score(q, c):
        s = 0.0
        for g in sorted(set(bigrams(texts[q]))):
            if g in kept and g in tf[c]:
                idf = math.log(1.0 + (n - df[g] + 0.5) / (df[g] + 0.5))
                t = float(tf[c][g])
                s += idf * (t * (1.2 + 1.0)
                            / (t + 1.2 * (0.25 + 0.75 * dl[c] / avgdl)))
        return s

    got = [(r["query_id"], r["neighbor_id"], r["bm25_micro"], r["rank"])
           for r in bm25_topk(docs, [0, 4], k=3).collect()]
    want = []
    for q in (0, 4):
        ranked = sorted(((round(score(q, c) * 1e6), c)
                         for c in texts if c != q and score(q, c) > 0),
                        key=lambda x: (-x[0], x[1]))[:3]
        want += [(q, c, s, i + 1) for i, (s, c) in enumerate(ranked)]
    assert got == want


def test_bitext_margin_demotes_hub_vectors(spark):
    """The ratio margin (r11) must score a one-to-one translation pair
    above a hub pairing of equal raw cosine: the hub's dense candidate
    neighborhood inflates its normalizer."""
    from precios_nexo_sperant_etl_spark.operators.similarity import (
        bitext_margin_pairs)

    # 2-D toy geometry, replicated into 8 dims; all six vectors land
    # in ONE sign bucket of the single LSH plane (x, y both positive
    # along its aggregate direction), so every cross-lingual pair is a
    # candidate. Anchor 0 has one clean match (10) and distant other
    # candidates; hub 1 sits in a dense cluster (11-13) of equally
    # good candidates — its margin must not reward that density.
    def v(x, y):
        return [float(x), float(y)] * 4

    docs = spark.createDataFrame(
        [(0, "en"), (1, "en"), (10, "es"), (11, "es"),
         (12, "es"), (13, "es")], "doc_id long, lang string")
    emb = spark.createDataFrame(
        [(0, v(0.3, 0.9)), (1, v(0.6, 0.6)),
         (10, v(0.3, 0.91)), (11, v(0.59, 0.61)),
         (12, v(0.6, 0.6)), (13, v(0.61, 0.59))],
        "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["margin_micro"]
           for r in bitext_margin_pairs(
               docs, emb, "en", "es", k_margin=3,
               margin_threshold=0.0, n_planes=1,
               max_bucket_size=None).collect()}
    # all 8 cross pairs are candidates (single shared bucket)
    assert len(got) == 8
    # the clean match out-margins every hub pairing
    hub_margins = [m for (a, _), m in got.items() if a == 1]
    assert got[(0, 10)] > max(hub_margins)
