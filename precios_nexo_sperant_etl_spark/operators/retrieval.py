"""Hybrid retrieval: sparse (inverted-index token overlap) ranking and
reciprocal-rank fusion of ranked lists.

Beyond-reference surface. The production shape of LLM-era search is
hybrid: a dense ANN ranking (``similarity.cosine_topk`` /
``ivf_cosine_topk``) fused with a sparse lexical ranking, usually via
Reciprocal Rank Fusion (RRF, Cormack et al. 2009) — rank-based, so the
two scorers need no score calibration against each other, which is
exactly why it is the default fusion in Elasticsearch/OpenSearch/Vespa.

Scale shape: the sparse ranking is an inverted-index JOIN keyed by term
— the posting list — with document-frequency pruning so stop-ish terms
(df above a fixed fraction of the corpus) never enter the join; without
the prune a single 50%-df token joins half the corpus against every
probe. The dense side broadcasts the (tiny) probe set. Fusion itself
touches only the two top-k tables: |probes| × k rows each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def sparse_overlap_topk(docs: DataFrame, query_ids: list[int], k: int = 20,
                        df_prune_den: int = 10, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` lexical matches per probe document: candidates ranked by
    the count of shared distinct terms (overlap desc, candidate id asc).

    The term join runs only over terms with ``df * df_prune_den <= N``
    (document frequency at most 1/df_prune_den of the corpus) — the
    posting-list prune that keeps the join linear in the number of
    *discriminative* term occurrences. Probes prune the same way, so
    overlap is counted over the pruned vocabulary on both sides
    (a probe-only stopword can never create a candidate anyway).
    Integer scoring end-to-end; ties broken by candidate id.
    """
    toks = (docs.select(F.col(id_col).alias("did"),
                        F.explode(tokens(F.col(text_col))).alias("term"))
                .where(F.col("term") != "")
                .distinct())
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    df_tab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    kept = (df_tab.crossJoin(F.broadcast(n_docs))
                  .where(F.col("_df") * df_prune_den <= F.col("_n"))
                  .select("term"))
    pruned = toks.join(kept, "term")
    probes = (pruned.where(F.col("did").isin(query_ids))
                    .select(F.col("did").alias("query_id"), "term"))
    scored = (pruned.join(F.broadcast(probes), "term")
                    .where(F.col("did") != F.col("query_id"))
                    .groupBy("query_id", F.col("did").alias("neighbor_id"))
                    .agg(F.count(F.lit(1)).cast("int").alias("overlap")))
    w = (Window.partitionBy("query_id")
               .orderBy(F.desc("overlap"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .orderBy("query_id", "rank"))


def rrf_fuse(a: DataFrame, b: DataFrame, k0: int = 60,
             topk: int = 10) -> DataFrame:
    """Reciprocal Rank Fusion of two ranked lists.

    Both inputs carry ``(query_id, neighbor_id, rank)``; the fused score
    is ``1/(k0 + rank_a) + 1/(k0 + rank_b)`` with a missing ranking
    contributing 0 (full outer join over the candidate union). Each term
    is one correctly-rounded double division and the sum is written in a
    fixed order, so the score — and the final ranking, tie-broken by
    neighbor id — is engine-exact. ``k0 = 60`` is the constant from the
    original RRF paper.
    """
    ra = a.select("query_id", "neighbor_id", F.col("rank").alias("rank_a"))
    rb = b.select("query_id", "neighbor_id", F.col("rank").alias("rank_b"))
    fused = (ra.join(rb, ["query_id", "neighbor_id"], "full_outer")
               .select("query_id", "neighbor_id", "rank_a", "rank_b",
                       (F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_a")),
                                   F.lit(0.0))
                        + F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_b")),
                                     F.lit(0.0))).alias("rrf_score")))
    w = (Window.partitionBy("query_id")
               .orderBy(F.desc("rrf_score"), F.asc("neighbor_id")))
    return (fused.withColumn("fused_rank", F.row_number().over(w))
                 .filter(F.col("fused_rank") <= topk)
                 .orderBy("query_id", "fused_rank"))
