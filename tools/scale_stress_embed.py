"""Embedding/vocab scale-stress: explode embeddings ×k (and documents
×k, via scale_stress.exploded_docs) and verify the SemDeDup and BPE
cost models hold as the corpus grows.

Embedding replicas are SIGN-SCRAMBLED copies: replica r multiplies
dimension d by a pseudo-random ±1 drawn from (r, d). Sign patterns
cancel inside a replica (s_d² = 1), so every within-replica dot product
— and therefore the whole duplicate structure — is preserved EXACTLY,
while cross-replica cosines scramble toward 0. True near-dup pairs
scale ×k, not ×k².

SemDeDup is timed in its two phases because they scale differently:

- ``assign``: k-means cell assignment, O(n · cells · dim) dense
  arithmetic — embarrassingly parallel, no shuffle; its 100 TB path is
  the vectorized matmul noted in ``assign_kmeans_cells``'s docstring.
- ``pairs``: the within-cell self-join + survivor anti-join — the part
  with quadratic RISK. With cells grown ∝ corpus (constant cell
  population, the paper's regime) its cost is Σ cell² ∝ k: this is the
  number the stress must show growing linearly.

BPE is timed end-to-end: the corpus is touched once (word-frequency
agg); merge rounds run on the vocab-sized table, so wall should grow
far slower than ×k (the replica substitution grows the vocab, which is
reported so the ratio can be judged fairly).

Usage: python tools/scale_stress_embed.py [sf_dir] [k ...] (default 1 3 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.functions.exact import ddot  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from tools.scale_stress import exploded_docs  # noqa: E402

_M, _J, _P = 2654435761, 40503, 1_000_003  # similarity.py's plane constants


def exploded_embeddings(spark, sf_dir: str, k: int) -> DataFrame:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    if k == 1:
        return emb.repartition(32, "vec_id")
    rep = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("rep")
    sign = (f"transform(sequence(1, size(embedding)), d -> "
            f"CASE WHEN (d * {_M}L + rep * {_J}L) % {_P} % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END)")
    return (emb.select("*", rep)
            .select((F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
                    F.expr(f"zip_with(embedding, {sign}, "
                           f"(v, s) -> CAST(v * s AS FLOAT))")
                     .alias("embedding"),
                    "label")
            .repartition(32, "vec_id"))


def run_semdedup_phases(emb: DataFrame, n_cells: int,
                        threshold: float = 0.35) -> tuple[float, float, int]:
    from precios_nexo_sperant_etl_spark.operators.similarity import (
        assign_kmeans_cells)
    t0 = time.time()
    cells = assign_kmeans_cells(emb, n_cells=n_cells,
                                n_iter=1).localCheckpoint(eager=True)
    t_assign = time.time() - t0

    t0 = time.time()
    a = cells.select(F.col("vec_id").alias("ka"),
                     F.col("embedding").alias("va"), "cell")
    b = cells.select(F.col("vec_id").alias("kb"),
                     F.col("embedding").alias("vb"), "cell")
    cos = (ddot(F.col("va"), F.col("vb"))
           / (F.sqrt(ddot(F.col("va"), F.col("va")))
              * F.sqrt(ddot(F.col("vb"), F.col("vb")))))
    drops = (a.join(b, "cell").filter(F.col("ka") < F.col("kb"))
              .filter(cos >= threshold).select("kb").distinct())
    n_surv = (cells.join(drops, cells["vec_id"] == drops["kb"], "left_anti")
                   .count())
    t_pairs = time.time() - t0
    return t_assign, t_pairs, n_surv


def run_semdedup_arrow(emb: DataFrame, n_cells: int,
                       threshold: float = 0.35) -> tuple[float, float, int]:
    """Same two phases through the Arrow gear: matmul assignment
    (``assign_kmeans_cells_arrow``) and per-cell matmul drops
    (``semdedup_drops_arrow``)."""
    from precios_nexo_sperant_etl_spark.operators.similarity import (
        assign_kmeans_cells_arrow, semdedup_drops_arrow)
    t0 = time.time()
    cells = assign_kmeans_cells_arrow(emb, n_cells=n_cells,
                                      n_iter=1).localCheckpoint(eager=True)
    t_assign = time.time() - t0
    t0 = time.time()
    drops = semdedup_drops_arrow(cells, threshold)
    n_surv = (cells.join(drops, cells["vec_id"] == drops["drop_id"],
                         "left_anti").count())
    return t_assign, time.time() - t0, n_surv


def run_bpe(docs: DataFrame, n_merges: int = 4) -> tuple[float, int]:
    from precios_nexo_sperant_etl_spark.operators.bpe import bpe_learn
    from precios_nexo_sperant_etl_spark.operators.text import tokens
    vocab = (docs.select(F.explode(tokens(F.col("text"))).alias("w"))
                 .filter(F.col("w") != "").distinct().count())
    t0 = time.time()
    bpe_learn(docs, n_merges=n_merges).collect()
    return time.time() - t0, vocab


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 3, 10]
    spark = get_spark(app_name="scale-stress-embed")
    # warmup outside every timed baseline
    run_semdedup_phases(exploded_embeddings(spark, sf_dir, 1), n_cells=10)
    spark.catalog.clearCache()
    results = []
    for k in ks:
        emb = exploded_embeddings(spark, sf_dir, k).localCheckpoint()
        n_vec = emb.count()
        t_assign, t_pairs, n_surv = run_semdedup_phases(emb,
                                                        n_cells=10 * k)
        spark.catalog.clearCache()
        ta_arrow, tp_arrow, n_surv_a = run_semdedup_arrow(emb,
                                                          n_cells=10 * k)
        spark.catalog.clearCache()
        docs = exploded_docs(spark, sf_dir, k).localCheckpoint()
        t_bpe, vocab = run_bpe(docs)
        spark.catalog.clearCache()
        row = {"k": k, "n_vec": n_vec, "cells": 10 * k,
               "semdedup_assign_s": round(t_assign, 2),
               "semdedup_pairs_s": round(t_pairs, 2),
               "survivors": n_surv,
               "arrow_assign_s": round(ta_arrow, 2),
               "arrow_pairs_s": round(tp_arrow, 2),
               "arrow_survivors": n_surv_a,
               "bpe_wall_s": round(t_bpe, 2), "vocab": vocab}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
