"""End-to-end training-data lake job: curate → split → pack → write.

The composition the registry checks piecewise (`prep_pipeline` and
friends), taken through to its real product: a partitioned parquet lake
of packed training sequences plus a JSON manifest — the artifact a
downstream trainer actually consumes.

Stages (all public operators, no new semantics):

1. exact dedup survivors → MinHash near-dup clusters → keep cluster
   representatives (min-id),
2. quality + language gates,
3. deterministic hash split (train/val/test — all splits kept here,
   unlike the train-only registry query),
4. greedy sequence packing per (lang, split) shard,
5. write parquet partitioned by ``(lang, split)`` — partition pruning
   gives a trainer "the English train shard" without touching the rest —
   and a driver-side manifest JSON (per-shard doc/sequence/token counts;
   ≤ |langs|·3 rows collected, a serving document not a dataset).

Scale shape: nothing here adds to the audited per-operator costs — the
write is one shuffle-free sink pass over the packed frame (already
partitioned by the pack's groupBy), and `mode=overwrite` makes the job
idempotent: a re-run converges to the same files.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curated_sequences(docs: DataFrame, budget: int = 512,
                      quality_min: float = 0.5) -> DataFrame:
    """Stages 1-4: packed sequences for every split, with text carried
    through for the final write."""
    from ..operators.dedup_fuzzy import (exact_dedup_survivors,
                                         minhash_dedup_pairs)
    from ..operators.graph import cluster_assignment
    from ..operators.packing import pack_sequences
    from ..operators.serve import hash_split
    from ..operators.text import (BPE_ISH_PATTERN, lang_pred_expr,
                                  quality_expr)

    surv = exact_dedup_survivors(docs)
    pairs = minhash_dedup_pairs(surv, threshold=0.2)
    keepers = (cluster_assignment(surv, pairs)
               .filter(F.col("doc_id") == F.col("cluster_id"))
               .select("doc_id"))
    clean = surv.join(keepers, "doc_id")
    gated = (clean.select(
                "doc_id", "lang", "text",
                quality_expr(F.col("text")).alias("quality"),
                lang_pred_expr(F.col("text")).alias("lang_pred"),
                F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
                 .cast("long").alias("n_tokens"))
             .filter((F.col("quality") >= quality_min)
                     & (F.col("lang_pred") != "und")))
    split = hash_split(gated)
    sharded = split.withColumn(
        "shard", F.concat_ws("/", F.col("lang"), F.col("split")))
    packed = pack_sequences(sharded.select("shard", "doc_id", "n_tokens"),
                            budget=budget, group_col="shard")
    return (packed.join(split.select("doc_id", "lang", "split", "text",
                                     "quality"), "doc_id")
                  .select("lang", "split", "seq_id", "seq_fill",
                          "doc_id", "n_tokens", "quality", "text"))


def prep_to_lake(spark: SparkSession, sf_dir: str, out_dir: str,
                 budget: int = 512) -> dict[str, Any]:
    """Run the full job; returns the manifest (also written to
    ``out_dir/_manifest.json``)."""
    from ..sources.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    seqs = curated_sequences(docs, budget=budget)
    (seqs.write.mode("overwrite")
         .partitionBy("lang", "split")
         .parquet(os.path.join(out_dir, "sequences")))

    written = spark.read.parquet(os.path.join(out_dir, "sequences"))
    shard_rows = (written.groupBy("lang", "split")
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.countDistinct("seq_id").alias("n_sequences"),
                       F.sum("n_tokens").alias("n_tokens"))
                  .orderBy("lang", "split").collect())
    manifest = {
        "budget": budget,
        "shards": [{"lang": r["lang"], "split": r["split"],
                    "n_docs": r["n_docs"],
                    "n_sequences": r["n_sequences"],
                    "n_tokens": r["n_tokens"]} for r in shard_rows],
        "total_docs": sum(r["n_docs"] for r in shard_rows),
        "total_tokens": sum(r["n_tokens"] for r in shard_rows),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
