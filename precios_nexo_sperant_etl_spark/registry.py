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
    # ================= ROUND-6 WINDOW =================
    # --- r5 hash-reds, fixed: published decimals narrowed to
    # int64-backed DECIMAL(18,s) (the int128-publication mechanism
    # behind every r02-r05 hash failure; see the canary pair) ---
    "customer_rfm",
    "incremental_rollup_merge",
    "winsorized_mean_by_status",
    # --- mechanism canaries: identical values at two publication
    # widths; wide is EXPECTED red, narrow green — the pair localizes
    # the driver's int128 serialization divergence experimentally ---
    "canary_decimal_narrow",
    "canary_decimal_wide",
    # --- stale (implementation changed since stamp) ---
    "discount_band_revenue",   # revenue narrowed to DECIMAL(18,4)
    "ann_ivf_topk",            # fit/assign split + shared-fit memo
    # --- changed in r6 (ADVICE fixes) ---
    "cms_term_counts",             # cms_estimate left-join + coalesce 0
    "bloom_join_prefilter",        # bloom_probe per-row multiplicity id
    "systematic_weighted_sample",  # true integer div end-to-end
    "streaming_hll_registers",     # awaitTermination timeout surfaced
    # --- the 9 late-r5 deferrals (never stamped; deferral granted r5,
    # expires this round — stamp_ledger.DEFERRED_TO_NEXT) ---
    "pareto_frontier_docs",
    "order_value_drift",
    "cramers_v_lang_source",
    "event_transition_matrix",
    "survival_time_to_purchase",
    "item_item_copurchase",
    "event_volume_cusum",
    "ann_mrr_eval",            # construct 9.8s → 2.6s via shared fit
    "quantile_normalized_quality",
    # --- NEW in r6 (never stamped — outrank refreshes) ---
    "streaming_cms_counters",  # third bit-exact streaming merge algebra
    "token_budget_waterfill",  # closed-form integer mixture allocation
    "pmi_collocations",        # log-free rational PMI phrase mining
    "embedding_health_by_label",  # pre-ANN embedding QA diagnostics
    "epoch_repetition_schedule",  # data-constrained epoch waterfill
    "wav_decode_roundtrip",    # real WAV decode through mapInPandas
    "bmp_decode_roundtrip",    # real BMP decode through mapInPandas
    "vocab_coverage_curve",    # top-k token coverage datasheet
    "kmv_distinct_terms",      # KMV distinct-count sketch
    "streaming_bloom_bits",    # fourth bit-exact streaming merge algebra
    "heaps_vocab_growth",      # Heaps-law vocabulary growth curve
    "rrf_hybrid_retrieval",    # sparse+dense reciprocal-rank fusion
    "snm_part_pairs",          # sorted-neighborhood record linkage
    "contrastive_negative_samples",  # bucket-representative negatives
    # --- r01-cohort refresh (oldest stamps in the ledger; after this
    # round no stamp predates r02) ---
    "f4_to_number",
    "f5_safe_num",
    "f6_intlike_canon",
    "p11_tower_prefix",
    "o2_natural_sort",
    "f16_isclose",
    "string_ops_bundle",
    "p12_null_sentinels",
    "dedup_exact",
    "dedup_exact_survivors",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "ann_cosine_topk",
    "text_quality_score",
    # --- r02-cohort refresh (next-oldest; the serving/KPI anchor
    # block) — displaced by any new r6 queries, which outrank
    # refreshing valid stamps ---
    "a2_a4_kpi_cards",
    # (a5_value_counts, a6_kpi_by_group, a6_states_by_group,
    # a8_pivot_counts, a9_pct_within_group, p8_p9_filter_search plus
    # price_histogram, tpch_q4_order_priority, sql_text_interface,
    # monthly_revenue_mom, u1_union_by_name, o3_distinct_sorted,
    # o2_o4_sort_page and p10_scatter_points rotate to r7: their r02
    # stamps stand; the fourteen slots fund the new never-stamped r6
    # queries above.)
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
    from . import (queries_agg, queries_audit, queries_core,  # noqa: F401
                   queries_joins, queries_retrieval, queries_scalar,
                   queries_scale, queries_sketches, queries_streaming)
    _LOADED = True
