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
    # ================= ROUND-10 WINDOW =================
    # VERDICT r9 item 1, executed with one improvement: the committed
    # queue head (the 4 queries registered NEW in r9, never stamped)
    # plus the ENTIRE r03-stamp cohort — the ledger shows 44 standing
    # r03 stamps, not just the 16 §2-core ones the queue named — plus
    # the 2 oldest r04 stamps from the committed queue (w1/w2).
    # 4 + 44 + 2 = exactly the 50-slot window. After this round the
    # oldest standing stamp is r04 (38 queries), queued for r11.
    # NO new r10 queries are admitted to the window (registration-pause
    # discipline, VERDICT r9 item 2): anything registered this round
    # lands BEHIND the window.
    #
    # -- 1. never-stamped (new in r9; all re-verified locally this
    #       round AFTER the ADVICE.md zstd/AV1/H.264 fixes) --
    "zstd_compressed_roundtrip",   # RFC 8878 FSE/Huffman blocks
    "h264_slice_header_walk",      # H.264 slice-header walk
    "warc_zst_extract",            # WARC-over-zstd composition
    "av1_obu_probe",               # AV1 OBU sequence-header walk
    # -- 2. the 44-query r03 cohort, oldest standing stamps --
    "core_update_audit",           # flagship §3.1 audit pipeline
    "w4_row_id",                   # two-pass deterministic row-id
    "f3_accent_fold",              # accent fold + header dedup
    "f8_to_datetime",              # to_datetime coercion
    "null_safe_join",              # null-safe equality join
    "scd2_merge",                  # SCD2 history merge
    "tpch_q21_sole_late_supplier", # TPC-H Q21
    "mad_outlier_filter",          # median/MAD outlier screen
    "skew_salted_join",            # salted fact-fact SMJ demo
    "table_profile_orders",        # per-column profile
    "tpch_q9_product_profit",      # TPC-H Q9
    "tpch_q11_important_stock",    # TPC-H Q11
    "tpch_q16_supplier_diversity", # TPC-H Q16
    "tpch_q20_dominant_supplier",  # TPC-H Q20
    "minhash_dedup_pairs_prod",    # 128x16 banded MinHash
    "minhash_dedup_pairs_capped",  # capped-band MinHash
    "tfidf_top_terms",             # TF-IDF top terms
    "vocab_oov_rate",              # vocab OOV rate
    "train_val_test_split",        # seeded split manifest
    "simhash_near_pairs",          # SimHash near-dup pairs
    "text_stats",                  # doc length/punct stats
    "text_lang_id",                # n-gram language id
    "text_top_terms",              # per-doc top terms
    "text_fingerprint",            # rolling-hash fingerprint
    "events_tumbling_agg",         # tumbling-window agg
    "events_sliding_agg",          # sliding-window agg
    "events_sessionize",           # gap sessionization
    "asof_join_click_purchase",    # as-of join
    "range_join_view_purchase",    # range join
    "multimodal_metadata",         # binary-payload metadata
    "multimodal_features",         # stubbed decode features
    "embedding_neardup_pairs",     # embedding-cosine near-dup
    "text_token_counts",           # whitespace+BPE-ish tokens
    "stratified_sample_docs",      # stratified sample
    "quantiles_by_status",         # exact quantiles by group
    "text_redact_pii",             # PII redaction
    "contamination_screen",        # eval-contamination screen
    "curation_pipeline",           # end-to-end curation chain
    "events_funnel",               # ordered funnel
    "events_props_struct",         # struct property pivot
    "rolling_7d_distinct_users",   # rolling distinct users
    "cohort_retention",            # cohort retention matrix
    "paragraph_dedup",             # paragraph-level dedup
    "text_repetition_stats",       # repetition/dup-ngram stats
    # -- 3. mid-r10 CORRECTNESS fix: the A-law expansion carried a
    #       global sign flip (sign bit 1 is POSITIVE; the oracle
    #       replicated the inversion so parity was green) — caught by
    #       the new exhaustive audioop cross-check, fixed on both
    #       sides. The r8 stamp attests the WRONG behavior, so this
    #       displaces the last refresh slot (w2_dedup_keep_last's r04
    #       stamp is old but VALID; it leads the r11 queue instead) --
    "g711_wav_roundtrip",          # A-law sign fix re-stamp
    # -- 4. the oldest r04 stamp (committed r10-queue tail) --
    "w1_dedup_latest",             # dedup keep-latest (NaT quirk)
    # --- ROUND-11 QUEUE (committed head, in priority order):
    # 1. The queries registered new in r10 (BEHIND this window):
    #    zstd_dict_roundtrip, h264_ipcm_roundtrip,
    #    warc_datasource_roundtrip — plus
    #    w2_dedup_keep_last, whose committed r10 slot was displaced by
    #    the g711_wav_roundtrip correctness re-stamp (its r04 stamp is
    #    old but valid).
    # 2. The 38-query r04-stamp cohort (oldest first; see STAMPS.md):
    #    j3_p6_change_detail, tpch_q1_pricing_summary,
    #    referential_integrity, j1_left_enrich_coalesce,
    #    j4_key_set_difference, tpch_q3/q5/q6, o2_es_collation,
    #    cross_corpus_neardup, lm_bigram_quality, neardup_clusters,
    #    neardup_survivors, cluster_aware_split, source_mix_weights,
    #    embedding_label_centroids, pack_efficiency_report,
    #    ngram_jaccard_pairs_capped, quality_calibrated_filter,
    #    corpus_card, split_leakage_screen, seq_manifest, source_stats,
    #    user_feature_vectors, langid_confusion, containment_pairs,
    #    source_dup_rate, zorder_layout, dsir_weights, zorder_layout3,
    #    events_anomaly_zscore, join_skew_report, dedup_threshold_curve,
    #    doc_lang_mismatch, order_fulfillment_lag, neardup_cluster_sizes.
    #    38 + new-in-r10 ≈ the full r11 window; r05 cohort follows in
    #    r12. Never-stamped evidence always beats refreshing a valid
    #    old stamp. ---
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
