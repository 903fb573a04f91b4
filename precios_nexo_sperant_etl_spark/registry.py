"""Registry of driver-checkable queries.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark_fn, oracle_sql)`` pair. ``spark_fn(spark, sf_dir) → DataFrame``
is the PySpark implementation; ``oracle_sql`` is the equivalent ANSI SQL
DuckDB runs on the same parquet tables. The driver hash-compares the two
at sf0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides
  (mixed-case aliases are double-quoted in the SQL);
- floating-point aggregations route through exact decimal accumulation
  (``functions.exact``) so values are bit-identical regardless of
  partitioning — see that module's docstring;
- queries with no SQL equivalent (streaming, iterative) register
  ``oracle_sql=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

#: The driver stamps only the FIRST 50 entries of ``queries()`` per round,
#: in iteration order — so ordering is a correctness-evidence budget, not
#: cosmetics. Names listed here surface first; everything else follows in
#: registration order. Policy: queries that were never driver-checked, were
#: rewritten since their last stamp, or failed last round go at the front;
#: long-stable green queries rotate to the back (their old stamps stand).
#: Update this list every round from the latest CORRECTNESS_r*.json.
_CHECK_FIRST: list[str] = [
    # --- registered in r3 past slot 50, never driver-checked (locally
    # green via tools/check_parity.py since r3; evidence gap only) ---
    "prep_pipeline",
    "containment_pairs",
    "seq_manifest",
    "source_stats",            # also rewritten r4: bround'ed quality
    "source_dup_rate",
    "user_feature_vectors",
    "langid_confusion",
    "split_leakage_screen",
    "neardup_survivors",
    "ngram_jaccard_pairs_capped",
    "corpus_card",
    # --- new in r4 ---
    "o2_es_collation",
    "cross_corpus_neardup",
    "lm_bigram_quality",
    "cluster_aware_split",
    "source_mix_weights",
    "doc_chunks",
    "semdedup_survivors",
    "zorder_layout",
    "bpe_merges",
    "bpe_token_budget",
    "dsir_weights",
    "referential_integrity",
    "multimodal_frame_schedule",
    "semdedup_diverse",
    "zorder_layout3",
    "events_anomaly_zscore",
    "join_skew_report",
    "pack_efficiency_report",
    "pack_sequences_by_lang",   # oracle refactored into shared CTE (r4)
    "dedup_threshold_curve",
    "doc_lang_mismatch",
    "shard_assignment",
    "repeat_high_spenders",
    "order_fulfillment_lag",
    "discount_band_revenue",
    "customer_rfm",
    "neardup_cluster_sizes",
    # --- rewritten in r4 after their r03 stamp (stale evidence) ---
    "quality_calibrated_filter",   # explicit order-statistic p25
    "neardup_clusters",            # CC localCheckpoint rounds
    "embedding_label_centroids",   # exact-path group-size guard
    # (streaming_parquet_upsert also changed in r4 but has no oracle
    # surface — pinned by the multi-batch pytest instead.)
    # --- oldest stamps in the ledger (r01) — refresh while slots allow ---
    # ann_cosine_topk / dedup_exact rotated out (r01-green refreshes,
    # unchanged).
    # dedup_exact_survivors / f16_isclose rotated out (r01-green
    # refreshes, unchanged).
    # f4_to_number / f5_safe_num / f6_intlike_canon /
    # minhash_signatures rotated out (r01-green refreshes, unchanged).
    # ngram_jaccard_pairs / o2_natural_sort / p11_tower_prefix /
    # p12_null_sentinels rotated
    # out (r01-green refreshes, unchanged).
    # simhash_signatures / string_ops_bundle rotated out (r01-green
    # refreshes, unchanged).
    # text_quality_score rotated out (r01-green refresh, unchanged).
    # --- r02 stamps on core anchors (everything r03-stamped rotates to
    # the back: those stamps are current, none rewritten since) ---
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_nation_revenue",
    "tpch_q6_forecast_revenue",
    "w1_dedup_latest",
    "w2_dedup_keep_last",
    "j1_left_enrich_coalesce",
    "j3_p6_change_detail",
    "j4_key_set_difference",
    # u1_union_by_name rotated out (r02-green, unchanged).
    # a2_a4_kpi_cards / a5_value_counts / a6_kpi_by_group /
    # a6_states_by_group / a8_pivot_counts / a9_pct_within_group /
    # o2_o4_sort_page / o3_distinct_sorted / p8_p9_filter_search /
    # p10_scatter_points rotated out to stay at 50 (all r02-green,
    # unchanged since).
]


def register(name: str, fn: QueryFn, oracle: str | None, doc: str = "") -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)


def _ordered() -> list[str]:
    front = [n for n in _CHECK_FIRST if n in _REGISTRY]
    missing = set(_CHECK_FIRST) - set(front)
    if missing:
        # A typo here would silently waste correctness-window slots.
        raise ValueError(f"_CHECK_FIRST names not registered: {sorted(missing)}")
    rest = [n for n in _REGISTRY if n not in set(front)]
    return front + rest


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: _REGISTRY[name].fn for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: _REGISTRY[name].oracle for name in _ordered()
            if _REGISTRY[name].oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # No try/except: a broken import here must fail loudly — swallowing it
    # would silently shrink queries()/oracle_sql() and the driver's
    # correctness gate would pass without checking the lost queries.
    from . import (queries_agg, queries_core, queries_joins,  # noqa: F401
                   queries_scalar, queries_scale)
    _LOADED = True
