"""Sketch-operator guarantees: CMS never undercounts, HLL registers
match a pure-Python replay of the same hash, Bloom has no false
negatives — the structural invariants the oracle hash alone can't
express."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from precios_nexo_sperant_etl_spark.operators.sketches import (
    bloom_bits, bloom_probe, cms_counters, cms_estimate, hll_estimate,
    hll_registers)

SF_DIR = "/root/testdata/sf0.001"


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _items(spark, values):
    return spark.createDataFrame([Row(item=v, w=1) for v in values])


def test_cms_never_undercounts_and_exact_when_wide(spark):
    vals = [f"tok{i}" for i in range(40) for _ in range(i + 1)]
    items = (_items(spark, vals).groupBy("item")
             .agg(F.count(F.lit(1)).alias("cnt")))
    # narrow sketch: collisions certain → est >= exact for EVERY item
    counters = cms_counters(items, "item", "cnt", depth=3, width=8)
    est = cms_estimate(items, counters, "item", depth=3, width=8)
    rows = est.collect()
    assert len(rows) == 40
    assert all(r.cms_est >= r.cnt for r in rows)
    assert any(r.cms_est > r.cnt for r in rows)  # 40 keys into 8 buckets
    # wide sketch: verify exactness only where no bucket is shared in
    # ANY row (the CMS min over rows is exact for those items)
    wide = cms_counters(items, "item", "cnt", depth=4, width=4096)
    est2 = {r.item: r.cms_est
            for r in cms_estimate(items, wide, "item", 4, 4096).collect()}
    exact = {r.item: r.cnt for r in items.collect()}
    buckets = {it: [_h48(f"{i}:{it}") % 4096 for i in range(4)]
               for it in exact}
    for it, b in buckets.items():
        clean = any(
            all(b[i] != ob[i] for oit, ob in buckets.items() if oit != it)
            for i in range(4))
        if clean:
            assert est2[it] == exact[it]
        else:
            assert est2[it] >= exact[it]


def test_cms_counters_merge_by_addition(spark):
    a = _items(spark, ["x", "x", "y"]).groupBy("item").agg(
        F.count(F.lit(1)).alias("cnt"))
    b = _items(spark, ["x", "z"]).groupBy("item").agg(
        F.count(F.lit(1)).alias("cnt"))
    merged = (cms_counters(a, "item", "cnt", 2, 16)
              .unionAll(cms_counters(b, "item", "cnt", 2, 16))
              .groupBy("row", "bucket").agg(F.sum("counter").alias("counter")))
    both = a.unionAll(b).groupBy("item").agg(F.sum("cnt").alias("cnt"))
    direct = cms_counters(both, "item", "cnt", 2, 16)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_hll_registers_match_python_replay(spark):
    vals = [f"term-{i}" for i in range(500)] * 2  # duplicates are free
    regs = {(r.bucket, ): r.rho
            for r in hll_registers(_items(spark, vals), "item", [], p=6)
            .collect()}
    expect: dict = {}
    for v in set(vals):
        h = _h48(v)
        bucket, word = h % 64, h // 64
        rho = 43 if word == 0 else 43 - word.bit_length()
        expect[(bucket,)] = max(expect.get((bucket,), 0), rho)
    got = {k: v for k, v in regs.items()}
    assert got == expect


def test_hll_estimate_reasonable_and_duplicate_insensitive(spark):
    uniq = [f"u{i}" for i in range(2000)]
    once = hll_estimate(
        hll_registers(_items(spark, uniq), "item", [], p=6), [], p=6
    ).collect()[0]
    thrice = hll_estimate(
        hll_registers(_items(spark, uniq * 3), "item", [], p=6), [], p=6
    ).collect()[0]
    assert once.scaled_sum == thrice.scaled_sum  # multiset-insensitive
    # standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(once.hll_estimate - 2000) < 2000 * 0.40


def test_bloom_no_false_negatives_and_fp_bound(spark):
    build = _items(spark, [str(i) for i in range(0, 200)])
    probe = _items(spark, [str(i) for i in range(0, 400)]).withColumnRenamed(
        "item", "key")
    bits = bloom_bits(build, "item", n_hashes=3, n_bits=4096)
    out = bloom_probe(probe.select("key"), bits, "key", 3, 4096).collect()
    passed = {r.key for r in out if r.bloom_pass}
    assert {str(i) for i in range(200)} <= passed  # no false negatives
    fp = len(passed) - 200
    # k=3, m=4096, n=200 → FPR ≈ (1-e^{-kn/m})^k ≈ 0.25%; 200 probes
    assert fp <= 10


def test_cms_unseen_item_estimates_zero(spark):
    corpus = _items(spark, ["a", "a", "b"]).groupBy("item").agg(
        F.count(F.lit(1)).alias("cnt"))
    counters = cms_counters(corpus, "item", "cnt", depth=3, width=4096)
    # wide sketch → an unseen item's buckets are almost surely all empty;
    # the estimate must be 0, not a dropped row or an inflated min over
    # whichever cells happen to be occupied
    probe = _items(spark, ["never-in-corpus"]).select("item")
    rows = cms_estimate(probe, counters, "item", 3, 4096).collect()
    assert len(rows) == 1
    assert rows[0].cms_est == 0


def test_bloom_probe_preserves_duplicate_row_multiplicity(spark):
    build = _items(spark, ["a", "b"])
    bits = bloom_bits(build, "item", n_hashes=3, n_bits=1024)
    # probe has NO unique key: 3 copies of "a", 2 of "zzz"
    probe = _items(spark, ["a", "a", "a", "zzz", "zzz"]).select("item")
    out = bloom_probe(probe, bits, "item", 3, 1024).collect()
    assert len(out) == 5
    assert sum(1 for r in out if r.item == "a" and r.bloom_pass) == 3
    assert sum(1 for r in out if r.item == "zzz") == 2


def test_bloom_bits_bounded_by_geometry(spark):
    build = _items(spark, [str(i) for i in range(5000)])
    bits = bloom_bits(build, "item", n_hashes=3, n_bits=256)
    assert bits.count() <= 256


def test_histogram_quantile_within_bound_and_mergeable(spark):
    from precios_nexo_sperant_etl_spark.queries_sketches import (
        _HQ_BINS, _hist_quantile)
    rows = _hist_quantile(spark, SF_DIR).collect()
    assert rows, "expected one row per order status"
    for r in rows:
        assert 0 <= r.median_bin < _HQ_BINS
        assert r.within_one_bin
        assert abs(r.approx_p50 - r.exact_p50) <= r.bin_width
    # bin counts merge by addition: histogram of two halves == histogram
    # of the whole (the property that makes it a sketch)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"))
    lo, hi = o.agg(F.min("cents"), F.max("cents")).collect()[0]
    bin_expr = F.expr(f"((cents - {lo}) * {_HQ_BINS}) div ({hi} - {lo} + 1)")
    whole = sorted(map(tuple, o.groupBy("o_orderstatus",
                                        bin_expr.alias("bin"))
                       .count().collect()))
    half_a = o.where(F.col("cents") % 2 == 0)
    half_b = o.where(F.col("cents") % 2 != 0)
    merged = (half_a.groupBy("o_orderstatus", bin_expr.alias("bin")).count()
              .unionAll(half_b.groupBy("o_orderstatus",
                                       bin_expr.alias("bin")).count())
              .groupBy("o_orderstatus", "bin").agg(F.sum("count")
                                                   .alias("count")))
    assert sorted(map(tuple, merged.collect())) == whole


def test_kmv_exact_below_k_and_estimate_above(spark):
    from precios_nexo_sperant_etl_spark.operators.sketches import kmv_sketch
    # group "small": 10 distinct values -> sketch holds all, count exact;
    # group "big": 5000 distinct values -> estimate within KMV's expected
    # relative error (~1/sqrt(k-1) ~ 12.6% at k=64; assert a lax 4 sigma).
    rows = ([Row(g="small", v=f"s{i}") for i in range(10)]
            + [Row(g="big", v=f"b{i}") for i in range(5000)])
    df = spark.createDataFrame(rows)
    out = {r.g: r for r in kmv_sketch(df, "v", ["g"], k=64).collect()}
    assert out["small"].k_used == 10
    assert out["small"].kmv_est == 10
    assert out["big"].k_used == 64
    assert abs(out["big"].kmv_est - 5000) / 5000 < 0.5


def test_kmv_duplicate_insensitive_and_mergeable(spark):
    from precios_nexo_sperant_etl_spark.operators.sketches import kmv_sketch
    rows = [Row(g="g", v=f"x{i % 300}") for i in range(3000)]
    df = spark.createDataFrame(rows)
    once = kmv_sketch(df.distinct(), "v", ["g"], k=32).collect()[0]
    dup = kmv_sketch(df, "v", ["g"], k=32).collect()[0]
    assert (once.k_used, once.h_k, once.kmv_est) == (dup.k_used, dup.h_k,
                                                     dup.kmv_est)
    # merge = k-min of the union of the two halves' sketches: re-running
    # the same selection over sketch state reproduces the whole-corpus
    # sketch (the property that makes KMV a partial aggregate).
    half_a = df.where(F.length("v") % 2 == 0)
    half_b = df.where(F.length("v") % 2 != 0)
    from precios_nexo_sperant_etl_spark.operators.text import md5_hash
    state = None
    for half in (half_a, half_b):
        h = (half.select(md5_hash(F.col("v")).alias("h")).distinct()
                 .orderBy("h").limit(32))
        state = h if state is None else state.unionAll(h)
    merged = (state.distinct().orderBy("h").limit(32)
              .agg(F.count(F.lit(1)).alias("k_used"), F.max("h").alias("h_k"))
              .collect()[0])
    assert (merged.k_used, merged.h_k) == (dup.k_used, dup.h_k)
