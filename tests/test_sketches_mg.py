"""Misra-Gries summary: the N/k guarantee under adversarial
partitionings, merge correctness, and the exact-recount pin."""

import random
from collections import Counter

import pyspark.sql.functions as F

from precios_nexo_sperant_etl_spark.operators.sketches import (
    misra_gries_merge, misra_gries_partition)


def _stream(rng, n):
    # skewed stream: a few heavy items + long tail
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.3:
            out.append("heavy_a")
        elif r < 0.45:
            out.append("heavy_b")
        else:
            out.append(f"tail_{rng.randrange(500)}")
    return out

def test_guarantee_across_partitionings(spark):
    rng = random.Random(41)
    items = _stream(rng, 20000)
    truth = Counter(items)
    n = len(items)
    k = 32
    for parts in (1, 7, 32):
        df = spark.createDataFrame([(x,) for x in items],
                                   "term string").repartition(parts)
        sk = misra_gries_merge(misra_gries_partition(df, "term", k), k)
        est = {r["item"]: r["mg_count"] for r in sk.collect()}
        assert len(est) < k + 1
        for item, c in truth.items():
            e = est.get(item, 0)
            assert e <= c
            assert e * k >= c * k - n, (item, parts)
        for item, c in truth.items():
            if c * k > n:               # true heavy hitter
                assert item in est, (item, parts)


def test_single_partition_matches_classic_mg(spark):
    # deterministic classic behaviour: k-1 counters, cancellation
    items = list("aaaabbbc") + ["d"]
    df = spark.createDataFrame([(x,) for x in items],
                               "term string").coalesce(1)
    sk = misra_gries_partition(df, "term", 3)
    est = {r["item"]: r["mg_count"] for r in sk.collect()}
    assert len(est) <= 2
    assert est.get("a", 0) >= 1        # the majority item survives
