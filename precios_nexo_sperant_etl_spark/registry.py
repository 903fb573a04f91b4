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
    # ================= ROUND-8 WINDOW =================
    # Slots 1-34: every query that had NEVER carried a driver stamp at
    # r8 start (the late-r7 additions — media decoders/probes, the
    # quality-probe ML family, web ingest, stats). All 34 were
    # parity-verified locally AND independently by the r7 judge
    # (type-strict, 0 failures); this window converts that local
    # evidence into driver stamps — VERDICT r7 item 1. Then the
    # queries ADDED or CHANGED in r8 (slots 35-46), then 4 of the
    # oldest (r03) stamp refreshes. The 10 NEW-in-r8 queries listed
    # mid-window are parity-green at sf0.01 AND sf0.1 as of their
    # registration commits; anything that misses this window (late-r8
    # additions, the rest of the r03 cohort) heads the R9 queue —
    # STAMPS.md names them.
    "jpeg_decode_roundtrip",       # baseline JPEG Huffman+IDCT decode
    "mp4_box_probe",               # ISO-BMFF box walker
    "mp3_frame_probe",             # MPEG audio frame-header walk
    "exif_orientation_probe",      # TIFF/EXIF IFD walker
    "wav_frame_energy",            # PCM frame energy windows
    "webdataset_roundtrip",        # tar-shard write + re-walk
    "orc_roundtrip",               # ORC source/sink seam
    "quality_linear_probe",        # exact normal-equation trainer
    "quality_linear_scores",       # probe scoring pass
    "quality_probe_eval",          # held-out probe eval
    "quality_ridge_probe",         # ridge-regularized variant
    "curriculum_order_manifest",   # probe-score curriculum ordering
    "streaming_gram_moments",      # 6th streaming merge algebra (SUM)
    "poisson_bootstrap_means",     # one-pass bootstrap replicates
    "poisson_bootstrap_ci",        # percentile CI over replicates
    "poisson_bootstrap_by_source", # per-source bootstrap
    "welch_t_sources",             # Welch's t across sources
    "snapshot_diff",               # content-hash snapshot diff
    "cdc_chunk_dedup",             # Rabin content-defined chunking
    "unicode_nfc_roundtrip",       # NFC canonicalization audit
    "charset_sniff",               # byte-level charset detection
    "html_extract_text",           # tag-strip + entity decode
    "warc_record_extract",         # WARC record walker
    "web_curation_pipeline",       # WARC → curated datasheet
    "chat_template_manifest",      # chat template + loss masks
    "fim_split_manifest",          # fill-in-middle splits
    "skipgram_pairs",              # window-bounded skip-grams
    "negative_sampling_table",     # unigram^0.75 sampling table
    "pretoken_stats",              # BPE pre-tokenization counts
    "maxmatch_tokenize",           # WordPiece greedy longest match
    "matryoshka_topk_agreement",   # truncated-dim ANN agreement
    "minhash_band_ablation",       # recall-vs-cost band sweep
    "shuffle_quality_audit",       # seeded-shuffle independence
    "pseudonymize_fk_audit",       # FK-consistent pseudonymization
    # --- NEW in r8: names appended HERE as each is registered, so new
    # queries enter the window ahead of the refresh cohort below ---
    "jpeg420_decode_roundtrip",    # 4:2:0/4:2:2 subsampled baseline
    "psl_registrable_domain",      # full-PSL edge cases (wildcards,
                                   # exceptions) vs hand-derived truth
    # changed since their r07 stamps (registrable_domain now runs the
    # real PSL snapshot; oracle regenerated from the same rule tables)
    "url_host_extract",
    "domain_dedup_datasheet",
    "pareto_frontier_docs",        # window now over distinct-lengths agg
    "mp3_sideinfo_audit",          # Layer-III reservoir invariants
    "loo_source_influence",        # closed-form LOO data attribution
    "priority_sample_docs",        # DLT weighted sampling, integer pri
    "streaming_lww_snapshot",      # 7th merge algebra: keyed argmax
    "domain_cap_manifest",         # PSL-keyed per-domain quota cap
    "eval_panel_quota",            # Hamilton apportionment panel
    "jpeg_progressive_roundtrip",  # SOF2 multi-scan G.2 decode
    "png_adam7_roundtrip",         # interlaced PNG pass lattices
    "gif_decode_roundtrip",        # real LZW + palette + interlace
    "g711_wav_roundtrip",          # ITU-T mu/A-law expansion
    "streaming_stateful_sessions",  # applyInPandasWithState machine
    # --- ROUND-9 QUEUE (committed head, in priority order):
    # 1. The never-stamped late-r8 additions IN REGISTRATION ORDER —
    #    the cohort from quality_stump_probe through
    #    gini_domain_concentration, plus the r8-session additions
    #    (kneser_ney_perplexity, levenshtein_decontam,
    #    length_matched_sample, sitemap_url_extract, phonetic_blocking,
    #    jl_projection_audit, bradley_terry_strengths,
    #    holt_winters_forecast, flac_subframe_decode, zstd_frame_probe,
    #    elo_ratings, probe_auc_rank, winnowing_fingerprints);
    #    STAMPS.md's "never stamped" list is
    #    the authoritative enumeration. Every one is parity-green at
    #    sf0.01 AND sf0.1 in the session that registered it (plus full
    #    0-failure sweeps at both scale factors mid-r8). 34 > the
    #    leftover slots after any r8 reds, so r9 should fill its whole
    #    window from this cohort before refreshing any standing stamp.
    # 2. The r03-stamp cohort refresh (VERDICT r7 item 7 — the r8
    #    additions ultimately filled every leftover slot):
    #    core_update_audit, w4_row_id, f3_accent_fold, f8_to_datetime,
    #    null_safe_join, scd2_merge, tpch_q9/q21, mad_outlier_filter,
    #    skew_salted_join, table_profile_orders, tpch_q11/q16/q20,
    #    minhash_dedup_pairs_prod/_capped — standing stamps, refresh
    #    when slots allow; never-stamped evidence beats refreshing a
    #    valid old stamp. ---
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
