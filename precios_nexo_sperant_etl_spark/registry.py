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
    # --- never driver-checked as of r02 (registered past slot 50) ---
    "mad_outlier_filter",
    "f8_to_datetime",
    "f3_accent_fold",
    "null_safe_join",
    "scd2_merge",
    "minhash_dedup_pairs_prod",
    "text_top_terms",
    "ann_ivf_topk",
    "text_fingerprint",
    "events_tumbling_agg",
    "events_sliding_agg",
    "events_sessionize",
    "asof_join_click_purchase",
    "range_join_view_purchase",
    "multimodal_metadata",
    "multimodal_features",
    "embedding_neardup_pairs",
    "text_token_counts",
    "stratified_sample_docs",
    "quantiles_by_status",
    "text_redact_pii",
    "contamination_screen",
    "curation_pipeline",
    "events_funnel",
    "events_props_struct",
    "rolling_7d_distinct_users",
    "cohort_retention",
    # --- rewritten in r2 after their r01 stamp (stale evidence) ---
    "simhash_near_pairs",
    "minhash_dedup_pairs",
    # minhash_signatures rotated out: its rewritten shingle path is
    # stamped transitively by minhash_dedup_pairs (in-window consumer).
    "text_stats",
    # text_quality_score rotated out: quality_expr is stamped in-window
    # by curation_pipeline and quality_calibrated_filter (same column
    # expression and same oracle SQL fragment).
    "text_lang_id",
    # --- r02 red row (oracle type fixed in r3) / changed in r3 ---
    "paragraph_dedup",
    "minhash_dedup_pairs_capped",
    "skew_salted_join",
    "table_profile_orders",
    "w4_row_id",
    "tpch_q21_sole_late_supplier",
    "core_update_audit",
    # j1_left_enrich_coalesce rotated out: r02-green, and its changed
    # enrich edge (hint removal) is covered in-window by core_update_audit.
    # --- new in r3: clustering, TF-IDF, OOV, Gopher repetition filters ---
    "neardup_clusters",
    "tfidf_top_terms",
    "vocab_oov_rate",
    "embedding_label_centroids",
    "train_val_test_split",
    "pack_sequences_by_lang",
    "quality_calibrated_filter",
    "text_repetition_stats",
    # --- new in r3: full TPC-H coverage (q9/q11/q16/q20 anchors) ---
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_diversity",
    "tpch_q20_dominant_supplier",
    # dedup_exact_survivors changed in r3 (explicit repartition) but its
    # path is stamped transitively: curation_pipeline consumes it
    # in-window, and dedup_exact pins the unchanged hash/keep-min logic.
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
