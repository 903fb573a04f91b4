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
    # ================= ROUND-7 WINDOW =================
    # The window is exactly full: 15 fixed/new-in-early-r7 + rrf + the
    # 35-query r02-stamp cohort (VERDICT r6 item 4: after this round no
    # stamp predates r03). The 11 queries ADDED LATE in r7 (media
    # probes/decoders, WebDataset, the quality-probe ML family,
    # streaming Gram) therefore stay outside this window by design —
    # STAMPS.md flags them loudly — and form the committed head of the
    # ROUND-8 WINDOW: jpeg_decode_roundtrip, mp4_box_probe,
    # mp3_frame_probe, exif_orientation_probe, wav_frame_energy,
    # webdataset_roundtrip, quality_linear_probe, quality_linear_scores,
    # quality_probe_eval, curriculum_order_manifest,
    # streaming_gram_moments. All are parity-green locally
    # (tools/check_parity.py, sf0.01) as of their registration commits.
    # --- the r06 hash-reds, fixed: DECIMAL publication removed
    # entirely (both r06 canaries came back red → the driver harness
    # diverges on decimal output at any width; these now publish
    # DOUBLE on both engines, accumulation stays exact internally).
    # discount_band_revenue was green but published DECIMAL(18,4);
    # converted too so the no-decimal policy is universal. ---
    "customer_rfm",
    "incremental_rollup_merge",
    "winsorized_mean_by_status",
    "discount_band_revenue",
    # --- NEW in r7 (never stamped; uncommented as each is registered) ---
    "png_decode_roundtrip",        # real zlib/Paeth PNG decode oracle
    "domain_dedup_datasheet",      # URL/domain-keyed dedup + mix stats
    "streaming_late_drop",         # watermark lateness value oracle
    "url_host_extract",            # domain parsing primitive
    "cc_largestar_equivalence",    # large/small-star CC vs hash-min
    "jpeg_header_probe",           # real JPEG marker/SOF dimension probe
    "streaming_kmv_minima",        # fifth streaming merge algebra (min)
    "gzip_text_roundtrip",         # gzip ingestion seam value oracle
    "training_order_manifest",     # seeded deterministic global shuffle
    "bmp_resize_features",         # exact integer box-downsample resize
    # --- changed in r7: plan diet (shared posting-list subtree) ---
    "rrf_hybrid_retrieval",
    # --- r02-cohort refresh (the oldest stamps in the ledger;
    # fingerprints unrecorded in r02 so `changed` is unknowable —
    # after this round no stamp predates r03) ---
    "a5_value_counts",
    "a6_kpi_by_group",
    "a6_states_by_group",
    "a8_pivot_counts",
    "a9_pct_within_group",
    "a10_distinct_counts",
    "a11_topk_value_counts",
    "rollup_status_priority",
    "p8_p9_filter_search",
    "p10_scatter_points",
    "o2_o4_sort_page",
    "o3_distinct_sorted",
    "u1_union_by_name",
    "u3_key_intersect",
    "sql_text_interface",
    "monthly_revenue_mom",
    "price_histogram",
    "cube_flag_status",
    "grouping_sets_orders",
    "approx_agg_bounds",
    "serving_filtered_chart",
    "events_props_json",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_predicates",
    "tpch_q22_global_sales_opportunity",
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
                   queries_joins, queries_ml, queries_retrieval,
                   queries_scalar, queries_scale, queries_sketches,
                   queries_streaming)
    _LOADED = True
