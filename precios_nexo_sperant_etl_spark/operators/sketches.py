"""Deterministic streaming sketches: Count-Min, HyperLogLog registers,
and a Bloom-filter join pre-filter.

Beyond-reference surface (the reference has no sketch operators). At
100 TB the exact answers these approximate — term frequencies, distinct
counts, join-key membership — are themselves cheap to *aggregate* but
expensive to *ship*: a vocabulary or key set can be billions of rows,
while a sketch is kilobytes. The operators here build the sketch with
one shuffle whose key space is the (tiny, fixed) sketch geometry, so the
reduce side is O(d·w) / O(m) rows regardless of input size, and every
sketch is mergeable (counters add, registers max, bit sets union) — the
map-side combine IS the sketch merge, which is what makes them work as
partial aggregates on a 1000-executor cluster and as state in a
streaming job.

Everything is integer arithmetic over the repo's canonical 48-bit md5
hash (`text.md5_hash`), so results are bit-identical across engines and
partitionings; the only floats are final single divisions (the HLL
estimate, the Bloom FP rate). No randomness: "seeded" hash families are
literal prefixes folded into the hash input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_hash

#: 48-bit hash width; after dropping p bucket bits via integer division
#: the HLL rank word is (48 - p) bits wide for any p <= 6 we use — the
#: register value rho is "leading zeros + 1" within that word.


def seeded_bucket(value: Column, seed: int, width: int) -> Column:
    """Bucket of ``value`` under hash-family member ``seed``: the 48-bit
    md5 of ``"{seed}:" || value`` reduced mod ``width``. The literal
    prefix is the seed — cheap, portable, and collision-independent
    across seeds because md5 mixes the prefix into every output bit."""
    return F.pmod(md5_hash(F.concat(F.lit(f"{seed}:"), value)), F.lit(width))


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def cms_counters(items: DataFrame, item_col: str, weight_col: str,
                 depth: int, width: int) -> DataFrame:
    """Count-Min counter table ``(row, bucket, counter)`` over weighted
    items: ``counter[i][j] = Σ weight`` of items whose seed-``i`` bucket
    is ``j``. One groupBy on the (depth × width) sketch geometry — the
    shuffle writes at most ``d·w`` rows per map partition (map-side
    combine folds everything else), so the reduce stage is constant-size
    at any input scale. Counters are mergeable by addition: union two
    corpora's counter tables and re-sum to sketch the union.
    """
    buckets = F.array(*[seeded_bucket(F.col(item_col), i, width)
                        for i in range(depth)])
    return (items
            .select(F.posexplode(buckets).alias("row", "bucket"),
                    F.col(weight_col))
            .groupBy("row", "bucket")
            .agg(F.sum(weight_col).alias("counter")))


def cms_estimate(queries: DataFrame, counters: DataFrame, item_col: str,
                 depth: int, width: int) -> DataFrame:
    """Point estimates for ``queries[item_col]``: the min over the
    ``depth`` counters the item hashes to. Adds column ``cms_est``.
    The counter table is sketch-sized (≤ d·w rows) → broadcast join;
    the probe never shuffles. CMS guarantee: ``cms_est >= true count``
    always (collisions only add), with overshoot ≤ 2N/w at probability
    1 − 2^−d for total weight N.

    The counter join is LEFT with ``coalesce(counter, 0)``: a counter
    table only materializes touched (row, bucket) cells, so an item the
    corpus never hashed into must read those cells as 0 — an inner join
    would drop the item entirely (all cells empty) or overestimate (min
    over only the occupied cells).
    """
    buckets = F.array(*[seeded_bucket(F.col(item_col), i, width)
                        for i in range(depth)])
    other = [c for c in queries.columns]
    return (queries
            .select(*other, F.posexplode(buckets).alias("row", "bucket"))
            .join(F.broadcast(counters), ["row", "bucket"], "left")
            .groupBy(*other)
            .agg(F.min(F.coalesce(F.col("counter"), F.lit(0).cast("long")))
                  .alias("cms_est")))


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

def hll_registers(items: DataFrame, item_col: str, group_cols: list[str],
                  p: int = 6) -> DataFrame:
    """HLL register table ``(group…, bucket, rho)`` at precision ``p``
    (``m = 2**p`` registers per group).

    bucket = low ``p`` bits of the 48-bit hash (mod m); the remaining
    ``48-p``-bit word's "position of first 1 from the top, 1-based" is
    rho (all-zero word → rho = 49-p). ``max(rho)`` per bucket is the
    register. Duplicates are free (same hash → same rho → max is a
    no-op), so the input needs NO distinct pass — that is the whole
    point of HLL at scale: the shuffle key space is m rows per group.
    Registers merge by max: union + re-max sketches a corpus union.
    """
    m = 1 << p
    word_bits = 48 - p
    h = md5_hash(F.col(item_col))
    bucket = F.pmod(h, F.lit(m))
    # bin() prints without leading zeros, so bitlen(v) = length(bin(v));
    # rho = (word_bits - bitlen) + 1, and v = 0 means all zeros.
    v = h - bucket  # reuse h; (h div m) == (h - pmod)/m exactly
    v = (v / m).cast("long")  # exact: both operands < 2^48 << 2^53
    rho = (F.when(v == 0, F.lit(word_bits + 1))
            .otherwise(F.lit(word_bits + 1) - F.length(F.bin(v)))
           ).cast("int")
    return (items
            .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(registers: DataFrame, group_cols: list[str],
                 p: int = 6) -> DataFrame:
    """Cardinality estimate from a register table. The harmonic-mean sum
    ``Σ 2^−rho`` is carried as the EXACT integer ``Σ 2^(maxrho − rho)``
    (powers of two — no float accumulation), absent registers contribute
    ``2^maxrho`` each; the one double division happens at the very end,
    so the estimate is identical under any partitioning and across
    engines. alpha_m for m = 64 is the textbook 0.709 (Flajolet et al.
    2007). The small-range linear-counting correction needs ln() — a
    cross-engine determinism hazard — so it is left to consumers; the
    raw estimate plus ``n_registers_set`` (from which V = m − set) is
    enough to apply it downstream.
    """
    m = 1 << p
    word_bits = 48 - p
    maxrho = word_bits + 1
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    scaled = F.expr(f"shiftleft(1L, cast({maxrho} - rho as int))")
    agg = (registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_registers_set"),
        F.max("rho").cast("int").alias("max_rho"),
        F.sum(scaled).alias("scaled_present")))
    scaled_sum = (F.col("scaled_present")
                  + (F.lit(m) - F.col("n_registers_set"))
                  * F.lit(1 << maxrho).cast("long"))
    est = (F.lit(float(alpha) * m * m * float(1 << maxrho))
           / scaled_sum.cast("double"))
    return agg.select(*group_cols, "n_registers_set", "max_rho",
                      scaled_sum.alias("scaled_sum"),
                      est.alias("hll_estimate"))


# ---------------------------------------------------------------------------
# Bloom-filter join pre-filter
# ---------------------------------------------------------------------------

def bloom_bits(keys: DataFrame, key_col: str, n_hashes: int,
               n_bits: int) -> DataFrame:
    """Single-column DataFrame ``bit`` of set Bloom positions for the
    build-side key set (k seeded buckets per key, distinct). At most
    ``n_bits`` rows whatever the key count — the distributed analogue of
    the bit array, mergeable by union (OR of two filters)."""
    pos = F.array(*[seeded_bucket(F.col(key_col).cast("string"), i, n_bits)
                    for i in range(n_hashes)])
    return keys.select(F.explode(pos).alias("bit")).distinct()


def bloom_probe(probe: DataFrame, bits: DataFrame, key_col: str,
                n_hashes: int, n_bits: int,
                flag_col: str = "bloom_pass") -> DataFrame:
    """Adds boolean ``flag_col``: true iff every one of the key's k bits
    is set — i.e. the key *may* be in the build set (no false negatives,
    bounded false positives). The bit table is ≤ n_bits rows →
    broadcast; the probe side never shuffles, which is the production
    use: drop most non-matching rows of a huge fact BEFORE the real
    (shuffling) join, paying one broadcast scan instead. Spark's own
    runtime bloom (spark.sql.optimizer.runtime.bloomFilter) does this
    inside AQE; this operator is the explicit, engine-portable form with
    a testable FP accounting.

    Row multiplicity is preserved: the k exploded bits re-assemble under
    a per-row surrogate id, not the value columns, so duplicate probe
    rows (no unique key required) each keep their own output row. The id
    is internal only — it never leaves the operator, so its
    partitioning-dependent values can't affect the result.
    """
    pos = F.array(*[seeded_bucket(F.col(key_col).cast("string"), i, n_bits)
                    for i in range(n_hashes)])
    cols = probe.columns
    hits = (probe
            .withColumn("_probe_row", F.monotonically_increasing_id())
            .select("_probe_row", *cols, F.explode(pos).alias("bit"))
            .join(F.broadcast(bits.withColumn("_set", F.lit(1))),
                  "bit", "left")
            .groupBy("_probe_row", *cols)
            .agg((F.sum(F.coalesce(F.col("_set"), F.lit(0)))
                  == F.lit(n_hashes)).alias(flag_col))
            .drop("_probe_row"))
    return hits


# ---------------------------------------------------------------------------
# K-minimum-values distinct sketch
# ---------------------------------------------------------------------------

#: 2^48 — the hash space width of text.md5_hash. KMV treats hashes as
#: positions on [0, 2^48); the k-th smallest position estimates density.
KMV_SPACE = 1 << 48

#: Shard count for the two-level k-min selection (level-1 window key
#: space is |groups| x KMV_SHARDS, so no single sort task ever sees more
#: than ~1/KMV_SHARDS of a group's distinct hashes).
KMV_SHARDS = 64


def kmv_sketch(items: DataFrame, item_col: str, group_cols: list[str],
               k: int = 64) -> DataFrame:
    """Per-group k-minimum-values sketch: the ``k`` smallest distinct
    48-bit hashes of ``item_col``, reduced to ``(k_used, h_k, kmv_est)``.

    KMV (Bar-Yossef et al. 2002 / Beyer et al. 2007) is the third
    distinct-count sketch family next to HLL: uniform hashes are uniform
    positions on [0, 2^48), so the k-th smallest position h_k estimates
    the density as ``(k-1) * 2^48 / h_k``. Unlike HLL's registers it is
    also an exact SAMPLE of the keyspace (the k min-hash keys), which
    is what makes it the building block for distinct-sum/Jaccard
    estimators. When a group has fewer than ``k`` distinct values the
    sketch holds all of them and the count is exact.

    Scale shape — "k smallest per group" is a top-k, not a sort: a
    global per-group window would funnel each group's whole distinct
    hash set through one sort task. Two levels instead: level 1 ranks
    within ``(group, h % KMV_SHARDS)`` — 64 parallel windows per group,
    each keeping its local k — level 2 ranks the surviving <= 64*k rows
    per group. Merging two sketches is "k smallest of the union", the
    same selection, so the sketch is a mergeable partial aggregate like
    the other three families. Integer arithmetic end-to-end: the
    estimate is a true integer division, engine-exact at any magnitude.
    """
    return kmv_finalize(kmv_minima(items, item_col, group_cols, k=k),
                        group_cols, k=k)


def kmv_minima(items: DataFrame, item_col: str, group_cols: list[str],
               k: int = 64) -> DataFrame:
    """The sketch STATE: per group, the ``k`` smallest distinct 48-bit
    hashes as ``(*group_cols, h)`` rows — the mergeable half of
    :func:`kmv_sketch`. Merging sketches is "k smallest of the union
    of minima", which is lossless (any global top-k minimum is a
    minimum within its own part), so these rows are what the streaming
    landing persists per batch."""
    from pyspark.sql import Window
    h = (items.select(*group_cols,
                      md5_hash(F.col(item_col).cast("string")).alias("h"))
              .distinct())
    lvl1 = Window.partitionBy(*group_cols, F.pmod(F.col("h"), F.lit(KMV_SHARDS))) \
                 .orderBy("h")
    lvl2 = Window.partitionBy(*group_cols).orderBy("h")
    return (h.withColumn("_rn1", F.row_number().over(lvl1))
             .where(F.col("_rn1") <= k)
             .withColumn("_rn2", F.row_number().over(lvl2))
             .where(F.col("_rn2") <= k)
             .select(*group_cols, "h"))


def kmv_finalize(minima: DataFrame, group_cols: list[str],
                 k: int = 64) -> DataFrame:
    """Reduce (possibly merged) minima rows to the published sketch
    ``(k_used, h_k, kmv_est)``. Re-selects the k smallest first, so it
    accepts the union of several parts' minima as-is (each part
    contributes ≤ k rows per group — the window frame is bounded by
    parts × k, never corpus-sized)."""
    from pyspark.sql import Window
    w = Window.partitionBy(*group_cols).orderBy("h")
    kmin = (minima.select(*group_cols, "h").distinct()
                  .withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") <= k))
    agg = kmin.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("k_used"),
        F.max("h").alias("h_k"))
    est = F.when(F.col("k_used") < k, F.col("k_used").cast("long")) \
           .otherwise(F.expr(f"({k} - 1) * {KMV_SPACE}L div h_k"))
    return agg.select(*group_cols, "k_used", "h_k", est.alias("kmv_est"))


def misra_gries_partition(items: DataFrame, item_col: str,
                          k: int) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries (Misra &
    Gries 1982): each partition keeps at most ``k-1`` counters; on
    overflow every counter decrements (the classic k-way cancellation).
    Returns ``(item, mg_count)`` rows, ≤ k-1 per partition.

    Guarantees that survive ANY merge (Agarwal et al. 2013,
    "Mergeable summaries"): for every item,
    ``true_count - N/k <= mg_count_sum <= true_count``, so every item
    with frequency > N/k is PRESENT in the union of summaries — which
    is what makes a query over the sketch partition-independent when
    it publishes only theorem-backed facts."""
    import pandas as pd

    def mg(it):
        counters: dict = {}
        for pdf in it:
            for v in pdf[item_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k - 1:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "mg_count": list(counters.values())}
            if counters else {"item": [], "mg_count": []})

    return items.select(F.col(item_col).cast("string").alias(item_col)) \
        .mapInPandas(mg, f"item string, mg_count long")


def misra_gries_merge(summaries: DataFrame, k: int) -> DataFrame:
    """Merge per-partition MG summaries: sum matching counters, then
    apply the rank-(k)-subtraction (subtract the k-th largest count
    from every counter, drop non-positive) — the mergeable-summaries
    reduction that preserves the N/k error bound. Bounded input
    (≤ (k-1) × partitions rows), one aggregation + one window."""
    from pyspark.sql import Window

    summed = summaries.groupBy("item").agg(
        F.sum("mg_count").alias("mg_count"))
    w = Window.orderBy(F.col("mg_count").desc(), F.col("item"))
    ranked = summed.withColumn("rk", F.row_number().over(w))
    kth = ranked.agg(
        F.coalesce(F.max(F.when(F.col("rk") == k, F.col("mg_count"))),
                   F.lit(0)).alias("kth"))
    return (ranked.crossJoin(F.broadcast(kth))
            .withColumn("mg_count", F.col("mg_count") - F.col("kth"))
            .where(F.col("mg_count") > 0)
            .select("item", "mg_count"))
