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
    # ================= ROUND-9 WINDOW =================
    # VERDICT r8 item 1, executed verbatim: the 49 queries that have
    # NEVER carried a driver stamp (every late-r8 addition, in their
    # original registration order — STAMPS.md's "never stamped" list),
    # plus the `pareto_frontier_docs` re-stamp (its r08 stamp predates
    # the distinct-lengths-window rewrite, the ledger's one stale
    # entry). 49 + 1 = exactly the 50-slot window; NO new queries are
    # admitted this round so the stamp backlog drains to zero. All 49
    # were parity-green (type-strict, sf0.01 + sf0.1) in the sessions
    # that registered them and were independently re-verified by the
    # r8 judge (0 failures); this window converts that local evidence
    # into driver stamps.
    "quality_stump_probe",         # exact decision-stump probe
    "bradley_terry_strengths",     # MM-iteration pairwise strengths
    "elo_ratings",                 # sequential Elo pool ratings
    "probe_auc_rank",              # exact Mann-Whitney AUC
    "avi_mjpeg_frame_sample",      # RIFF/AVI MJPEG frame sampler
    "adpcm_wav_roundtrip",         # IMA ADPCM codec roundtrip
    "tiff_decode_roundtrip",       # baseline TIFF strip decode
    "robots_txt_gate",             # robots.txt allow/deny gate
    "image_dhash_neardup",         # dHash near-duplicate images
    "blocklist_screen",            # domain blocklist screen
    "dp_randomized_response",      # DP randomized-response audit
    "unicode_script_mix",          # per-doc Unicode script census
    "pq_quantization_codes",       # product-quantization codebooks
    "pq_adc_topk",                 # asymmetric-distance top-k
    "tfrecord_roundtrip",          # TFRecord write + re-walk
    "avro_container_roundtrip",    # Avro OCF null-codec roundtrip
    "avro_snappy_roundtrip",       # Avro OCF snappy blocks
    "longest_repeated_substring",  # suffix-ranking LRS per doc
    "mp4_sample_table_probe",      # stbl/stsz/stco sample tables
    "manifest_prune_audit",        # lake manifest prune audit
    "confusable_skeleton",         # UTS-39 confusable skeleton
    "arrow_ipc_roundtrip",         # Arrow IPC stream roundtrip
    "png_palette_roundtrip",       # PLTE/indexed-color PNG
    "tiff_multipage_roundtrip",    # multi-IFD TIFF walk
    "webm_block_probe",            # WebM/EBML element walk
    "h264_sps_probe",              # H.264 SPS exp-Golomb parse
    "crawl_token_bucket",          # politeness token-bucket sim
    "preference_cycle_audit",      # preference-graph cycle audit
    "annotator_kappa",             # Cohen/Fleiss agreement
    "media_curation_pipeline",     # decode→filter→datasheet chain
    "idn_label_roundtrip",         # IDN punycode label roundtrip
    "schema_evolution_audit",      # upcast-aware catalog diff
    "compaction_plan",             # small-file compaction planner
    "gini_domain_concentration",   # Gini/Lorenz domain mass
    "neardup_consensus",           # ≥2-vote multi-detector dedup
    "kneser_ney_perplexity",       # interpolated KN bigram PPL
    "levenshtein_decontam",        # banded edit-distance decontam
    "length_matched_sample",       # length-stratified pair sample
    "sitemap_url_extract",         # sitemap XML URL extraction
    "phonetic_blocking",           # Soundex/metaphone blocking
    "jl_projection_audit",         # JL random-projection audit
    "holt_winters_forecast",       # additive HW level/trend/seasonal
    "flac_subframe_decode",        # FLAC Rice-residual subframes
    "zstd_frame_probe",            # RFC 8878 frame/block walk
    "winnowing_fingerprints",      # MOSS winnowing fingerprints
    "streaming_static_enrich",     # stream×static broadcast enrich
    "streaming_session_builtin",   # session_window() aggregation
    "streaming_dedup_redelivery",  # dropDuplicates under redelivery
    "streaming_attribution_join",  # watermarked stream-stream join
    "pareto_frontier_docs",        # re-stamp: r08 stamp predates the
                                   # distinct-lengths window rewrite
    # --- ROUND-10 QUEUE (committed head, in priority order):
    # 1. The four queries registered NEW in r9 (zstd_compressed_roundtrip,
    #    h264_slice_header_walk, warc_zst_extract, av1_obu_probe) —
    #    deliberately registered BEHIND the window so they never
    #    displace the backlog-draining stamps; they head r10.
    # 2. The r03/r04-stamp cohort refresh, oldest first
    #    (VERDICT r7 item 7, carried through r8 item 5):
    #    core_update_audit, w4_row_id, f3_accent_fold, f8_to_datetime,
    #    null_safe_join, scd2_merge, tpch_q21_sole_late_supplier,
    #    mad_outlier_filter, skew_salted_join, table_profile_orders,
    #    tpch_q9_product_profit, tpch_q11_important_stock,
    #    tpch_q16_supplier_diversity, tpch_q20_dominant_supplier,
    #    w1_dedup_latest, w2_dedup_keep_last — 16 oldest standing
    #    stamps; refresh when slots allow. Never-stamped evidence
    #    always beats refreshing a valid old stamp. ---
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
