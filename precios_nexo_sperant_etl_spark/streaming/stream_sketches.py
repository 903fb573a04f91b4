"""Incremental sketch maintenance under Structured Streaming: the
mergeability that makes sketches work as partial aggregates on a batch
cluster (registers max, counters add) is exactly what makes them
maintainable per micro-batch — each batch lands its OWN sketch in a
``batch_id=N`` partition (dynamic overwrite → replay-idempotent, same
exactly-once recipe as ``streaming_parquet_upsert``), and the live
sketch is the merge-at-read over all landed partitions: max for HLL
registers, sum for CMS counters. No read-modify-write of shared state,
so a crashed-and-replayed batch can only overwrite itself.

At 100 TB of stream history the landed state stays tiny: ≤ m register
rows / d·w counter rows per batch, compacted by the same merge
expression whenever partitions accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup_fuzzy import canonical_text
from ..operators.sketches import bloom_bits, cms_counters, hll_registers
from ..operators.text import tokens


def streaming_hll_to_lake(docs: DataFrame, out_dir: str,
                          checkpoint: str, p: int = 6):
    """Maintain per-source HLL registers over a document stream.
    Returns the started query (caller awaits termination)."""
    def _land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            items = (batch.select(
                "source", F.explode(tokens(F.col("text"))).alias("term"))
                .where(F.col("term") != ""))
            (hll_registers(items, "term", ["source"], p=p)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite").partitionBy("batch_id")
                .parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (docs.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def read_hll_registers(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-at-read: the live register table over all landed batches."""
    return (spark.read.parquet(out_dir)
            .groupBy("source", "bucket").agg(F.max("rho").alias("rho")))


def streaming_cms_to_lake(docs: DataFrame, out_dir: str, checkpoint: str,
                          depth: int = 4, width: int = 256):
    """Maintain corpus term-count CMS counters over a document stream."""
    def _land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            terms = (batch.select(
                F.explode(tokens(F.col("text"))).alias("term"))
                .where(F.col("term") != "")
                .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
            (cms_counters(terms, "term", "cnt", depth, width)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite").partitionBy("batch_id")
                .parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (docs.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def read_cms_counters(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-at-read: live counters = per-(row, bucket) sum of batches."""
    return (spark.read.parquet(out_dir)
            .groupBy("row", "bucket").agg(F.sum("counter").alias("counter")))


def streaming_bloom_to_lake(docs: DataFrame, out_dir: str, checkpoint: str,
                            n_hashes: int = 3, n_bits: int = 4096):
    """Maintain a Bloom membership filter of canonical document text
    hashes over a document stream — the streaming form of the exact-dedup
    "seen set". The fourth streaming merge algebra: bits OR (set union of
    set positions), idempotent, so a replayed batch can neither lose nor
    double-count state. Each batch lands its own <= n_bits bit rows in a
    ``batch_id=N`` partition (dynamic overwrite, same exactly-once recipe
    as the HLL/CMS landings); the live filter is ``DISTINCT bit`` over
    all landed partitions."""
    def _land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            keys = batch.select(
                F.md5(canonical_text(F.col("text"))).alias("text_hash"))
            (bloom_bits(keys, "text_hash", n_hashes, n_bits)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite").partitionBy("batch_id")
                .parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (docs.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def read_bloom_bits(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-at-read: live filter = union (OR) of all landed bit sets."""
    return (spark.read.parquet(out_dir)
            .select("bit").distinct())


def streaming_kmv_to_lake(docs: DataFrame, out_dir: str, checkpoint: str,
                          k: int = 64):
    """Maintain per-source KMV distinct-term sketches over a document
    stream — the FIFTH streaming merge algebra: min-SELECTION (k
    smallest of the union), next to set-union (curation hashes), max
    (HLL registers), sum (CMS counters) and bit-OR (Bloom). Lossless by
    the top-k-of-parts argument in ``sketches.kmv_minima``: each batch
    lands its own ≤ k minima rows per group in a ``batch_id=N``
    partition (dynamic overwrite — replay-idempotent), and the live
    sketch re-selects over ≤ batches × k rows per group at read."""
    from ..operators.sketches import kmv_minima

    def _land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            items = (batch.select(
                "source", F.explode(tokens(F.col("text"))).alias("term"))
                .where(F.col("term") != ""))
            (kmv_minima(items, "term", ["source"], k=k)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite").partitionBy("batch_id")
                .parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (docs.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def read_kmv_sketch(spark: SparkSession, out_dir: str,
                    k: int = 64) -> DataFrame:
    """Merge-at-read: live sketch = k smallest of all landed minima."""
    from ..operators.sketches import kmv_finalize
    return kmv_finalize(spark.read.parquet(out_dir), ["source"], k=k)


def compact_sketch_lake(spark: SparkSession, out_dir: str, kind: str,
                        compacted_id: int = -1) -> None:
    """Fold all landed per-batch sketch partitions into one
    ``batch_id=<compacted_id>`` partition using the lake's own merge
    algebra — the maintenance pass that keeps merge-at-read cost O(1)
    in stream age instead of O(batches).

    Correct because every algebra here is idempotent-or-associative
    over partitions (max / sum / or / min-selection), and safe because
    the fold lands via an atomic swap: the merged frame is materialized
    (localCheckpoint) BEFORE the directory is rewritten, and the
    rewrite is mode("overwrite") of the whole lake in one job — a
    reader never sees a half-compacted mix of old and new partitions
    in separate files because batch_id partitioning is rebuilt wholesale.
    CMS is the one non-idempotent algebra (sum), so compaction must not
    race a live landing; run it between drains (the availableNow model
    used here has no always-on writer).
    """
    merged = {
        "hll": lambda df: df.groupBy("source", "bucket")
                            .agg(F.max("rho").alias("rho")),
        "cms": lambda df: df.groupBy("row", "bucket")
                            .agg(F.sum("counter").alias("counter")),
        "bloom": lambda df: df.select("bit").distinct(),
        "kmv": lambda df: df.select("source", "h").distinct(),
    }
    if kind not in merged:
        raise ValueError(f"unknown sketch lake kind: {kind!r}")
    df = (merged[kind](spark.read.parquet(out_dir))
          .withColumn("batch_id", F.lit(compacted_id))
          .localCheckpoint(eager=True))
    (df.write.mode("overwrite").partitionBy("batch_id").parquet(out_dir))


def streaming_gram_to_lake(docs: DataFrame, out_dir: str,
                           checkpoint: str):
    """Maintain the quality-probe training moments (``queries_ml``:
    XᵀX Gram entries + Xᵀy, all exact BIGINT sums of integer features)
    over a document stream — the SIXTH streaming merge algebra is the
    simplest of all: component-wise integer SUM of a fixed-width moment
    vector. Each batch lands its own one-row moment frame in a
    ``batch_id=N`` partition (dynamic overwrite — replay-idempotent);
    the live moments are the column sums over landed batches, and
    re-SOLVING the 3×3 system on them refreshes the trained model after
    every micro-batch without ever rescanning stream history. That is
    incremental model training under exactly-once semantics, and
    because integer addition is associative/commutative the streamed
    moments equal the batch moments bit for bit."""
    def _land(batch: DataFrame, batch_id: int) -> None:
        from ..queries_ml import _features
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            f = batch.select(*_features())
            (f.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
                   F.sum(F.col("x1") * F.col("x1")).alias("s11"),
                   F.sum(F.col("x1") * F.col("x2")).alias("s12"),
                   F.sum(F.col("x2") * F.col("x2")).alias("s22"),
                   F.sum("y").alias("b0"),
                   F.sum(F.col("x1") * F.col("y")).alias("b1"),
                   F.sum(F.col("x2") * F.col("y")).alias("b2"))
               .na.fill(0)    # an empty batch lands a zero row, not nulls
               .withColumn("batch_id", F.lit(batch_id))
               .write.mode("overwrite").partitionBy("batch_id")
               .parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (docs.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def read_gram_moments(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-at-read: live moments = column sums over landed batches."""
    cols = ["n_docs", "s1", "s2", "s11", "s12", "s22", "b0", "b1", "b2"]
    return (spark.read.parquet(out_dir)
            .agg(*[F.sum(c).alias(c) for c in cols]))


def streaming_lww_to_lake(docs: DataFrame, out_dir: str, checkpoint: str):
    """Maintain a per-source LAST-WRITER-WINS snapshot over a document
    stream — the SEVENTH streaming merge algebra: keyed ARGMAX. The
    other algebras fold values (union/max/sum/OR/min/moment-sum); this
    one folds (version, payload) PAIRS by version order, which is what
    CDC snapshot maintenance and materialized-view upkeep reduce to.
    ARGMAX over a unique version key is associative, commutative and
    idempotent, so each batch lands only its own per-source winners in
    a ``batch_id=N`` partition (dynamic overwrite — replay can only
    overwrite itself) and the live snapshot is the argmax-at-read over
    landed winners. State per batch is ≤ |sources| rows regardless of
    stream volume."""
    from ..operators.dedup_fuzzy import canonical_text

    def _land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            snap = (batch.select(
                        "source", "doc_id",
                        F.md5(canonical_text(F.col("text")))
                         .alias("text_hash"))
                    .groupBy("source")
                    .agg(F.max_by(F.struct("doc_id", "text_hash"),
                                  "doc_id").alias("_w"))
                    .select("source",
                            F.col("_w.doc_id").alias("doc_id"),
                            F.col("_w.text_hash").alias("text_hash")))
            (snap.withColumn("batch_id", F.lit(batch_id))
                 .write.mode("overwrite").partitionBy("batch_id")
                 .parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (docs.writeStream.foreachBatch(_land)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def read_lww_snapshot(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-at-read: live snapshot = per-source argmax over landed
    batch winners (same fold the landing used — the algebra closes)."""
    return (spark.read.parquet(out_dir)
            .groupBy("source")
            .agg(F.max_by(F.struct("doc_id", "text_hash"), "doc_id")
                  .alias("_w"))
            .select("source", F.col("_w.doc_id").alias("doc_id"),
                    F.col("_w.text_hash").alias("text_hash")))
