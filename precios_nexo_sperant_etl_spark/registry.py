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
    # --- r5 front: failed r04 on oracle-type mismatch, fixed by casts ---
    "bpe_merges",
    "bpe_token_budget",
    "customer_rfm",
    # --- fresh r04 stamp whose fingerprint was absorbed late (ledger
    # hygiene): stamp once more clean ---
    "pack_sequences_by_lang",
    # --- changed in r5 (predicate/filter/plan or oracle cast) ---
    "repeat_high_spenders",        # exact cross-multiplied benchmark
    "doc_chunks",                  # empty-doc chunk filter
    "semdedup_survivors",          # arrow_assign default
    "semdedup_diverse",            # arrow_assign default
    "multimodal_frame_schedule",   # oracle duration_ms INT cast
    "window_analytics_suite",      # oracle row_number/rank INT casts
    # --- new in r5 ---
    "f22_money_format",
    "exact_substring_coverage",
    "fuzzy_part_match",
    "source_temperature_mix",
    "ccnet_lm_buckets",
    "filter_funnel",
    "incremental_rollup_merge",
    "pagerank_neardup",            # new r5: fixed-point integer PageRank
    "events_gapfill_locf",         # new r5: hypertable gap-fill + LOCF
    "corpus_diversity_index",      # new r5: Gini–Simpson mix datasheet
    "k_anonymity_screen",          # new r5: quasi-identifier audit
    "inverted_index_stats",        # new r5: term → postings datasheet
    "cms_term_counts",             # new r5: Count-Min sketch + exact top-k
    "hll_distinct_terms",          # new r5: HLL registers + estimate
    "bloom_join_prefilter",        # new r5: bloom semi-join accounting
    "expectations_report",         # new r5: Deequ-style constraint suite
    "systematic_weighted_sample",  # new r5: integer-exact weighted sample
    "price_trend_by_priority",     # new r5: OLS from exact sufficient stats
    "hll_set_algebra",             # new r5: register union/intersection
    "bpe_roundtrip_audit",         # new r5: tokenizer integrity gate
    "histogram_quantile_sketch",   # new r5: mergeable quantile sketch
    "event_cooccurrence_rules",    # new r5: A-Priori k=2 basket rules
    "discount_price_corr",         # new r5: exact-stats Pearson r
    "winsorized_mean_by_status",   # new r5: robust clipped mean
    "streaming_curation_hashes",   # new r5: first streaming hash oracle
    "streaming_hll_registers",     # new r5: streaming sketch, bit-exact
    # (pareto_frontier_docs, order_value_drift, cramers_v_lang_source,
    # event_transition_matrix, survival_time_to_purchase,
    # item_item_copurchase, event_volume_cusum, ann_mrr_eval, and
    # quantile_normalized_quality, added late in r5, wait for the r6
    # window (the authoritative list is stamp_ledger.DEFERRED_TO_NEXT):
    # every remaining slot is a fixed-red / changed / never-stamped
    # essential. Local evidence: type-strict parity green tuned AND
    # vanilla + brute-force dominance pytest. FRONT-LOAD IT IN r6.)
    # --- consumers of the r5 jaccard_pairs plan fix (shared-subtree
    # size aggregation): values unchanged (local type-strict parity
    # green across the whole family, tuned AND vanilla), plans changed.
    # TWO representatives re-stamp — the band generator
    # (minhash_dedup_pairs, the direct owner of the changed code) and
    # the full composition (prep_pipeline); the other family members
    # (_prod/_capped, ngram_jaccard_pairs + _capped, neardup_clusters,
    # cluster_aware_split, neardup_survivors, dedup_threshold_curve)
    # share that subtree verbatim, keep their r01–r04 value stamps, and
    # rotate to r6 — their slots fund the never-stamped r5 queries
    # above ---
    "minhash_dedup_pairs",
    "benford_digit_audit",
    # (cross_corpus_neardup rotates to r6: r04 stamp stands; its
    # two-sided jaccard mode is covered by the local type-strict gate
    # and the stream_neardup_ingest pytest; slot funds the streaming
    # HLL oracle.)
    # (neardup_clusters also rotates to r6: its r03 stamp stands, the
    # CC algorithm is unchanged, and the r5 jaccard subtree feeding it
    # is re-stamped by minhash_dedup_pairs and composed end-to-end by
    # prep_pipeline below; slot funds the streaming hash oracle.)
    "prep_pipeline",
    "neardup_triangles",
    # (neardup_cluster_sizes' re-stamp is covered by its upstream
    # cluster queries above; its slot goes to the new EWMA query)
    "ewma_user_activity",
    # --- oldest evidence: the r01 cohort (fingerprints unknown that
    # early) — refresh so no stamp predates r02. Three of the cohort
    # (f6_intlike_canon, p11_tower_prefix, string_ops_bundle) rotate to
    # r6: their slots go to the three never-stamped sketch queries
    # above — never-checked evidence outranks refreshing valid stamps,
    # and their code paths are pinned transitively (F6 canon feeds the
    # r03-stamped core_update_audit keys; P11/string ops re-stamp
    # through f4/f5's shared numparse window this round).
    # (dedup_exact and ann_cosine_topk also rotate to r6 for the two
    # never-stamped r5 quality/sampling queries: both are pinned
    # transitively every round — dedup_exact's md5-prefix plan runs
    # inside the r5-window prep_pipeline, ann_cosine_topk's ddot/top-k
    # inside the r03-stamped ann_ivf_topk.)
    # (f4_to_number / f5_safe_num rotate to r6 after all: the whole
    # r01-refresh cohort moves to r6 wholesale — their value stamps are
    # VALID, numparse is the most pytest-pinned surface in the repo
    # (test_numparse.py property suite + the golden reference-pipeline
    # e2e), and this round produced 11 genuinely never-stamped queries
    # that outrank any refresh. r6's window should lead with the r01
    # cohort.)
    # (o2_natural_sort: the sort-key family is pinned by o2_es_collation's
    # r04 stamp; p12_null_sentinels: the sentinel map is the same
    # numparse.py:96 path f5_safe_num re-stamps above; f16_isclose:
    # unchanged since r01 and its tolerance compare feeds the r03-stamped
    # core_update_audit. All three rotate to r6 — their slots go to the
    # three new governance queries at the front.)
    # (dedup_exact_survivors: its surface is dedup_exact's md5 prefix +
    # the ROW_NUMBER keep that prep_pipeline — in-window — composes;
    # slot goes to the new PageRank. text_quality_score: the score
    # expression is exercised in-window by gopher_quality_flags and
    # neardup_keep_best_quality; slot goes to the new gap-fill. Both
    # r01 refreshes rotate forward to r6.)
    # (minhash_signatures' surface is the exact prefix of
    # minhash_dedup_pairs, which re-stamps above — slot goes to the
    # new BPE compression curve)
    "bpe_compression_curve",
    # (simhash_signatures: r01 stamp stands and the signature fold is
    # pinned by the banding-lossless pytest pair — slot goes to the new
    # quality-keep survivor policy)
    "neardup_keep_best_quality",
    # --- new or changed in r5 (displace the r02 TPC-H anchor-block
    # refreshes entirely — those stamps are current, just old; they
    # rotate forward next round; stale-or-new evidence outranks
    # refreshing valid stamps) ---
    "dup_ngram_rate",
    "gopher_quality_flags",
    "stratified_sample_audit",
    "embedding_quantization_audit",
    "shard_assignment",            # rank moved to two-pass row id (r5)
    "token_fertility_by_lang",
    "release_manifest",
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
                   queries_joins, queries_scalar, queries_scale,
                   queries_sketches, queries_streaming)
    _LOADED = True
