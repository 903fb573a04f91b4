"""BPE merge-learning and DSIR importance-weight semantics.

The registry oracles already value-hash both queries end-to-end; these
tests pin the contracts the hashes can't explain: frequency-weighted
argmax with deterministic tie-break, the documented two-pass replace
merge variant on self-adjacent chains, and the DSIR identity (target =
whole corpus → every weight is exactly 1.0).
"""

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id int, text string")


def test_bpe_picks_weighted_argmax_with_tiebreak(spark):
    from precios_nexo_sperant_etl_spark.operators.bpe import bpe_learn

    # 'ab' appears in 3 word-occurrences, 'cd' in 2 → first merge (a, b).
    docs = _docs(spark, ["ab ab ab cd", "cd"])
    got = bpe_learn(docs, n_merges=2).collect()
    assert (got[0]["p1"], got[0]["p2"], got[0]["pair_count"]) == ("a", "b", 3)
    assert (got[1]["p1"], got[1]["p2"], got[1]["pair_count"]) == ("c", "d", 2)

    # pure tie → lexicographically smallest pair wins
    tie = bpe_learn(_docs(spark, ["xy", "ab"]), n_merges=1).collect()
    assert (tie[0]["p1"], tie[0]["p2"]) == ("a", "b")


def test_bpe_two_pass_merge_on_self_adjacent_chain(spark):
    from precios_nexo_sperant_etl_spark.operators.bpe import bpe_learn

    # 'aaaa' → symbols a a a a; pair (a,a) count 3 (weighted by the one
    # word). After the merge the word must be 'aa aa' (two-pass replace
    # == greedy here), so round 2's best pair is (aa, aa).
    got = bpe_learn(_docs(spark, ["aaaa"]), n_merges=2).collect()
    assert (got[0]["p1"], got[0]["p2"], got[0]["pair_count"]) == ("a", "a", 3)
    assert (got[1]["p1"], got[1]["p2"]) == ("aa", "aa")


def test_bpe_merged_symbol_participates_in_later_rounds(spark):
    from precios_nexo_sperant_etl_spark.operators.bpe import bpe_learn

    # 'the' dominant: rounds should build t+h then th+e.
    docs = _docs(spark, ["the the the the cat"])
    got = bpe_learn(docs, n_merges=2).collect()
    assert (got[0]["p1"], got[0]["p2"]) == ("h", "e")  # tie (t,h)/(h,e): h<t
    assert got[0]["pair_count"] == 4
    assert (got[1]["p1"], got[1]["p2"], got[1]["pair_count"]) == ("t", "he", 4)


def test_dsir_identity_when_target_is_everything(spark):
    from precios_nexo_sperant_etl_spark.operators.text import (
        dsir_importance_weights)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = dsir_importance_weights(docs, target=F.lit(True), k=32)
    # ct == cr and nt == nr for every token → each ratio is exactly 1.0
    # and the ordered product stays exactly 1.0.
    bad = w.filter(F.col("dsir_weight") != 1.0)
    assert bad.count() == 0
    assert w.count() == docs.filter(F.trim("text") != "").count() \
        or w.count() == docs.count()


def test_dsir_weights_favor_target_like_docs(spark):
    from precios_nexo_sperant_etl_spark.operators.text import (
        dsir_importance_weights)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = (dsir_importance_weights(docs, target=F.col("lang") == "en", k=32)
         .join(docs.select("doc_id", "lang"), "doc_id"))
    means = {r["is_en"]: r["m"] for r in
             w.groupBy((F.col("lang") == "en").alias("is_en"))
              .agg(F.avg("dsir_weight").alias("m")).collect()}
    assert means[True] > means[False]


def test_bpe_encode_counts_compress_monotonically(spark):
    from precios_nexo_sperant_etl_spark.operators.bpe import (
        bpe_encode_counts)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    zero = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode_counts(docs, n_merges=0).collect()}
    six = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode_counts(docs, n_merges=6).collect()}
    chars = {r["doc_id"]: r["n"] for r in
             docs.select("doc_id",
                         F.length(F.regexp_replace(F.trim("text"),
                                                   r"\s+", "")).alias("n"))
                 .collect()}
    assert set(zero) == set(six) == set(chars)
    for d in zero:
        # 0 merges → every symbol is one character
        assert zero[d] == chars[d]
        # merges only ever shrink the budget, never below the ws count
        assert six[d] < zero[d]


def test_bpe_compression_curve_monotone_and_consistent(spark):
    """The curve starts at the weighted character count, decreases
    monotonically (every merge strictly reduces symbols of the winning
    pair's words), and each drop equals at least the round's pair count
    is NOT guaranteed under two-pass replace — but monotonicity and the
    round-0 anchor are."""
    from pyspark.sql import functions as F
    from precios_nexo_sperant_etl_spark.operators.bpe import (
        bpe_compression_curve)
    from precios_nexo_sperant_etl_spark.operators.text import tokens
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    curve = [r["total_symbols"]
             for r in bpe_compression_curve(docs, n_merges=4).collect()]
    assert len(curve) == 5
    chars = (docs.select(F.explode(tokens(F.col("text"))).alias("w"))
                 .filter(F.col("w") != "")
                 .agg(F.sum(F.length("w")).alias("s")).collect()[0]["s"])
    assert curve[0] == chars                      # round 0 = raw chars
    assert all(a >= b for a, b in zip(curve, curve[1:]))
    assert curve[-1] < curve[0]                   # merges actually paid
