"""Retrieval/linkage scale-stress: explode the sf0.1 documents table ×k
(same isomorphic-replica construction as ``scale_stress.py``) and verify
the cost models of the round-6 retrieval family hold as the corpus
grows:

- **sparse_overlap_topk** — the df-pruned inverted-index join's fan-out
  (posting rows joined against probe terms) must grow ~linearly in k,
  and the prune must keep it a small fraction of the unpruned fan-out
  (which is what a naive term join would pay; stop-ish terms join a
  constant fraction of the whole corpus against every probe).
- **sorted-neighborhood linkage** — candidates are EXACTLY
  ``N*(w-1) - (w-1)*w/2`` for N distinct sort keys (each key pairs with
  the next w-1, minus the tail boundary), because the window join is an
  equi-join on rank offsets; the count is asserted, not just reported.
- **kmv_sketch** — the sketch's state after the two-level k-min
  selection is bounded by ``groups × k`` OUTPUT rows regardless of k
  (corpus growth changes the hashes, never the state size), and the
  estimate stays within the ~1/sqrt(k_param) KMV error envelope of the
  exact distinct count.
- **negative_samples** — the broadcast representative table is bounded
  by ``n_buckets`` rows (one m1/m2 pair per bucket) regardless of
  corpus size, and NULL draws stay a measure-zero event once every
  bucket is populated.

Reports one JSON line per k. Usage:

    python tools/scale_stress_retrieval.py [sf_dir] [k ...]   # default 1 3 10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from tools.scale_stress import exploded_docs  # noqa: E402


def sparse_fanout(docs: DataFrame, probe_ids: list[int],
                  df_prune_den: int = 10,
                  ngram: int = 2) -> tuple[float, int, int, int]:
    """(wall of the full top-k query, pruned join fan-out, unpruned
    fan-out, kept-vocabulary size). Fan-out = posting rows that reach
    the probe join — the real cost driver of the sparse ranking.
    Measured over the same bigram shingle unit the registered
    rrf_hybrid_retrieval query uses."""
    from precios_nexo_sperant_etl_spark.operators.retrieval import (
        sparse_overlap_topk, term_sets)

    t0 = time.time()
    sparse_overlap_topk(docs, probe_ids, k=20,
                        df_prune_den=df_prune_den, ngram=ngram).count()
    wall = time.time() - t0

    toks = term_sets(docs, ngram=ngram)
    n_docs = docs.count()
    df_tab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    kept = df_tab.where(F.col("_df") * df_prune_den <= n_docs)
    n_vocab_kept = kept.count()
    # fan-out = Σ over (probe, term) pairs of that term's df: the join
    # emits one output row per posting row PER PROBE carrying the term,
    # so a shingle shared by several probes multiplies — summing over
    # the distinct term union would undercount the materialized rows.
    probe_terms = (toks.where(F.col("did").isin(probe_ids))
                       .select("did", "term"))
    pruned_fan = (kept.join(probe_terms, "term")
                      .agg(F.sum("_df")).first()[0] or 0)
    unpruned_fan = (df_tab.join(probe_terms, "term")
                          .agg(F.sum("_df")).first()[0] or 0)
    return wall, int(pruned_fan), int(unpruned_fan), n_vocab_kept


def snm_candidates(docs: DataFrame, w: int = 4) -> tuple[float, int, int]:
    """(wall, N distinct sort keys, candidate count). The count must be
    exactly N*(w-1) - (w-1)*w/2; a mismatch means the window join is no
    longer the rank-offset equi-join it claims to be."""
    from precios_nexo_sperant_etl_spark.operators.dedup import add_row_id

    t0 = time.time()
    keys = docs.select(F.substring("text", 1, 24).alias("key")).distinct()
    seq = add_row_id(keys, ["key"], name="rn")
    offs = seq.sparkSession.range(1, w).select(F.col("id").alias("_off"))
    a = seq.select(F.col("key").alias("key_a"), F.col("rn").alias("_ra"))
    b = seq.select(F.col("key").alias("key_b"), F.col("rn").alias("_rb"))
    cand = (a.crossJoin(F.broadcast(offs))
             .withColumn("_rb", F.col("_ra") + F.col("_off"))
             .join(b, "_rb"))
    n_cand = cand.count()
    wall = time.time() - t0
    n_keys = keys.count()
    expected = n_keys * (w - 1) - (w - 1) * w // 2
    # Explicit raise, not `assert`: SCALING.md cites this equality as the
    # stress guarantee, and asserts vanish under `python -O`.
    if n_cand != expected:
        raise AssertionError(
            f"snm candidate count {n_cand} != closed form {expected} "
            f"(n_keys={n_keys}, w={w})")
    return wall, n_keys, n_cand


def kmv_state(docs: DataFrame, k_param: int = 64) -> tuple[float, int,
                                                           float]:
    """(wall, output rows, worst relative error vs exact distinct over
    the per-lang groups)."""
    from precios_nexo_sperant_etl_spark.operators.sketches import kmv_sketch
    from precios_nexo_sperant_etl_spark.operators.text import tokens

    terms = (docs.select("lang",
                         F.explode(tokens(F.col("text"))).alias("term"))
                 .where(F.col("term") != ""))
    t0 = time.time()
    est = {r.lang: r.kmv_est
           for r in kmv_sketch(terms, "term", ["lang"], k=k_param).collect()}
    wall = time.time() - t0
    exact = {r.lang: r.n for r in
             terms.groupBy("lang").agg(F.countDistinct("term").alias("n"))
                  .collect()}
    worst = max(abs(est[g] - exact[g]) / exact[g] for g in exact)
    return wall, len(est), worst


def negative_state(docs: DataFrame, n_buckets: int = 64,
                   k: int = 2) -> tuple[float, int, int]:
    """(wall, representative-table rows, NULL draws in the output)."""
    from precios_nexo_sperant_etl_spark.operators.retrieval import (
        negative_samples)
    from precios_nexo_sperant_etl_spark.operators.text import md5_hash

    t0 = time.time()
    out = negative_samples(docs, n_buckets=n_buckets, k=k)
    nulls = out.filter(F.col("neg_id").isNull()).count()
    wall = time.time() - t0
    # the broadcast side, recomputed the way the operator builds it:
    # one (m1, m2) row per non-empty bucket, hashed the same way
    reps = (docs.select(
        F.pmod(md5_hash(F.concat(F.lit("nc:"),
                                 F.col("doc_id").cast("string"))),
               F.lit(n_buckets)).alias("b")).distinct().count())
    return wall, reps, nulls


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 3, 10]
    spark = get_spark(app_name="scale-stress-retrieval")
    for k in ks:
        docs = exploded_docs(spark, sf_dir, k).persist()
        n = docs.count()
        probes = [d * k for d in range(5)]  # rep-0 replicas of docs 0..4
        s_wall, fan_p, fan_u, vocab = sparse_fanout(docs, probes)
        n_wall, n_keys, n_cand = snm_candidates(docs)
        k_wall, k_rows, k_err = kmv_state(docs)
        g_wall, g_reps, g_nulls = negative_state(docs)
        print(json.dumps({
            "k": k, "n_docs": n,
            "sparse": {"wall": round(s_wall, 2), "fanout_pruned": fan_p,
                       "fanout_unpruned": fan_u, "vocab_kept": vocab},
            "snm": {"wall": round(n_wall, 2), "n_keys": n_keys,
                    "candidates": n_cand},
            "kmv": {"wall": round(k_wall, 2), "groups": k_rows,
                    "worst_rel_err": round(k_err, 4)},
            "negatives": {"wall": round(g_wall, 2),
                          "rep_buckets": g_reps, "null_draws": g_nulls},
        }), flush=True)
        docs.unpersist()


if __name__ == "__main__":
    main()
