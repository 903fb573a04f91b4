"""Greedy sequence packing — filling fixed token-budget training
sequences from variable-length documents.

The last mile of a training-data pipeline: documents become training
sequences of at most ``budget`` tokens, packed greedily in a
deterministic order so the same corpus always yields the same packing.
Greedy first-fit-in-order is genuinely SEQUENTIAL — each break point
depends on the running remainder, so no window/aggregate expresses it —
which makes it the honest use case for ``applyInPandas``: per-group
sequential Python over Arrow batches.

Scale shape: packing runs per group (language, shard); a real pipeline
packs per output shard, so groups are many and individually bounded —
each group's (id, token-count) pairs fit one task comfortably since only
NUMERIC columns cross the Python boundary (token counts are computed
JVM-side first; text never crosses). For unsharded corpora, pre-shard
with ``serve.hash_split``-style buckets and accept per-shard packing —
global greedy packing is inherently serial, and per-shard is what
production systems do anyway.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, budget: int, group_col: str = "lang",
                   id_col: str = "doc_id",
                   token_col: str = "n_tokens") -> DataFrame:
    """Assign each document a sequence id within its group.

    Within a group, documents are processed in ``id_col`` order: a doc
    joins the current sequence unless that would exceed ``budget``, in
    which case it starts the next one. A single document longer than the
    budget gets a sequence of its own (reported fill exceeds budget —
    truncation is the caller's policy decision, not the packer's).

    Output: (group, doc_id, n_tokens, seq_id, seq_fill) where seq_id
    counts from 0 per group and seq_fill is the running fill AFTER the
    document was placed.
    """
    group_type = df.schema[group_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (f"{group_col} {group_type}, {id_col} {id_type}, "
              f"{token_col} long, seq_id long, seq_fill long")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq, fill = 0, 0
        seqs, fills = [], []
        for t in pdf[token_col].astype("int64"):
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            fill += int(t)
            seqs.append(seq)
            fills.append(fill)
        pdf = pdf[[group_col, id_col, token_col]].copy()
        pdf["seq_id"] = pd.Series(seqs, dtype="int64")
        pdf["seq_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    # coalesce: a null token count (null text upstream) would crash the
    # Arrow worker's int64 cast; a null-text doc packs as 0 tokens.
    slim = df.select(F.col(group_col), F.col(id_col),
                     F.coalesce(F.col(token_col).cast("long"), F.lit(0))
                      .alias(token_col))
    return slim.groupBy(group_col).applyInPandas(_pack, schema)


def waterfill(sup: DataFrame, key_col: str = "source",
              supply_col: str = "supply_tokens",
              budget_num: int = 6, budget_den: int = 10) -> DataFrame:
    """Deterministic token-budget waterfill across groups.

    ``budget = total_supply * budget_num div budget_den`` (integer).
    Each group is funded up to a common water level capped at its own
    supply; the level is the closed form over the supply-ascending sort
    (group k is fully funded iff ``prefix(k-1) + supply_k*(n-k+1) <=
    budget`` — fullness is a prefix of the sort), and the remainder
    after integer division goes one token each to the smallest unfunded
    groups, so ``Σ allocated == min(budget, total)`` EXACTLY. Integer
    arithmetic end-to-end → identical in any engine/partitioning.

    Adds ``fully_funded`` and ``allocated_tokens``. All windows run
    over the per-group aggregate (|groups| rows — small by definition),
    so the unpartitioned window is a non-issue at corpus scale.
    """
    from pyspark.sql import Window
    w_ord = Window.orderBy(F.asc(supply_col), F.asc(key_col))
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    g = (sup
         .withColumn("_k", F.row_number().over(w_ord))
         .withColumn("_n", F.count(F.lit(1)).over(w_all))
         .withColumn("_total", F.sum(supply_col).over(w_all))
         .withColumn("_prefix", F.coalesce(
             F.sum(supply_col).over(w_prev), F.lit(0).cast("long")))
         .withColumn("_budget",
                     F.expr(f"_total * {budget_num} div {budget_den}"))
         .withColumn("fully_funded",
                     (F.col("_prefix")
                      + F.col(supply_col) * (F.col("_n") - F.col("_k") + 1))
                     <= F.col("_budget")))
    g = (g.withColumn("_prefix_full", F.sum(
              F.when(F.col("fully_funded"), F.col(supply_col))
               .otherwise(F.lit(0).cast("long"))).over(w_all))
          .withColumn("_n_full", F.sum(
              F.col("fully_funded").cast("long")).over(w_all))
          .withColumn("_n_tail", F.col("_n") - F.col("_n_full")))
    alloc = F.expr(
        f"CASE WHEN fully_funded THEN {supply_col} "
        f"WHEN _n_tail = 0 THEN {supply_col} "
        "ELSE (_budget - _prefix_full) div _n_tail "
        "     + (CASE WHEN (_k - _n_full) <= "
        "              (_budget - _prefix_full) % _n_tail "
        "        THEN 1 ELSE 0 END) END").cast("long")
    return (g.withColumn("allocated_tokens", alloc)
             .select(key_col, supply_col, "fully_funded",
                     "allocated_tokens"))
