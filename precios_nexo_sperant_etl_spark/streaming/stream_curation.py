"""Streaming document curation: the batch quality/language/dedup gates
applied to a file-drop stream of documents, landing in a partitioned
parquet lake through the exactly-once file sink.

Beyond-reference (§2.9): the same Catalyst expressions the batch
curation queries use (`text.quality_expr`, `text.lang_pred_expr`,
canonical text hash) run unchanged under Structured Streaming — the
"streaming twin" property the windowed KPIs already demonstrate,
extended to the corpus-curation domain.

Dedup semantics: ``dropDuplicates`` on the canonical text hash keeps the
FIRST arrival per hash. State is one hash per distinct document —
bounded by corpus cardinality, not stream length; for unbounded streams
pair it with periodic state TTL or the watermarked
``dropDuplicatesWithinWatermark`` used for events. The file sink commits
atomically per micro-batch (write-ahead log in the checkpoint), so a
crashed-and-restarted run neither loses nor duplicates documents.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the documents parquet via a staged symlink
    directory (the file-drop pattern; new files appearing there are
    picked up as they arrive)."""
    stage = os.path.join(tempfile.gettempdir(),
                         "stream_docs_" + sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    target = os.path.join(sf_dir, "documents.parquet")
    # The stage dir is shared across sessions keyed only by sf_dir, so
    # (a) a stale link can outlive a moved/regenerated dataset — validate
    # the target and recreate; (b) exists-check-then-symlink races with a
    # concurrent session — treat FileExistsError as "the other session
    # won" as long as its link points at the same target.
    if os.path.islink(link) and os.path.realpath(link) != \
            os.path.realpath(target):
        os.unlink(link)
    if not os.path.exists(link):
        try:
            os.symlink(target, link)
        except FileExistsError:
            if os.path.realpath(link) != os.path.realpath(target):
                raise
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    return spark.readStream.schema(schema).parquet(stage)


def curated_doc_stream(docs: DataFrame, quality_min: float = 0.5,
                       dedup: bool = True) -> DataFrame:
    """The batch gates as a streaming transformation: quality score,
    language prediction, token budget, canonical hash; optionally
    first-arrival dedup on the hash."""
    from ..operators.dedup_fuzzy import canonical_text
    from ..operators.text import (BPE_ISH_PATTERN, lang_pred_expr,
                                  quality_expr)

    gated = (docs.select(
        "doc_id", "lang", "source", "text",
        quality_expr(F.col("text")).alias("quality"),
        lang_pred_expr(F.col("text")).alias("lang_pred"),
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
         .cast("long").alias("n_tokens"),
        F.md5(canonical_text(F.col("text"))).alias("text_hash"))
        .filter((F.col("quality") >= quality_min)
                & (F.col("lang_pred") != "und")))
    return gated.dropDuplicates(["text_hash"]) if dedup else gated


def stream_curated_to_lake(spark: SparkSession, sf_dir: str, out_dir: str,
                           timeout_s: int = 180) -> None:
    """Land the curated stream in ``out_dir`` partitioned by lang via
    the exactly-once streaming file sink (availableNow: drain what is
    there, then stop — the batch-backfill idiom)."""
    curated = curated_doc_stream(stream_documents(spark, sf_dir))
    ckpt = os.path.join(out_dir, "_checkpoint")
    q = (curated.writeStream.format("parquet")
         .option("path", os.path.join(out_dir, "docs"))
         .option("checkpointLocation", ckpt)
         .partitionBy("lang")
         .trigger(availableNow=True).start())
    # An ignored timeout here would hand the caller a PARTIALLY-landed
    # lake (queries_streaming reads it for a bit-exact oracle compare) —
    # fail loudly instead, same contract as the queries_streaming sites.
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"curated-lake drain exceeded {timeout_s}s before completing")


def stream_neardup_ingest(spark: SparkSession, src_dir: str, out_dir: str,
                          threshold: float = 0.5,
                          timeout_s: int = 240) -> None:
    """Incremental near-dup-gated ingest — the streaming form of the
    cross-corpus ``minhash_join`` primitive: each micro-batch of
    documents dropped into ``src_dir`` is screened (a) against itself
    (batch-internal LSH pairs; the non-minimal side of every near-dup
    pair is dropped, the transitive policy of ``neardup_survivors``) and
    (b) against everything ALREADY LANDED in the lake (banded LSH join,
    both sides unbounded — no broadcast), and only novel documents
    append.

    ``foreachBatch`` is the right harness because the predicate depends
    on SINK state (what landed so far); per batch it costs one scan of
    the landed corpus — at production scale the landed side's shingle/
    signature frames would be maintained incrementally in a side table
    instead of recomputed, same plan shape.

    Idempotence note: a plain parquet ``append`` is not transactional
    under batch retry, but the gate itself heals re-appends — a replayed
    document is an EXACT duplicate of its landed copy, shares every
    band, and is dropped by the cross-corpus screen, so retries
    converge instead of double-ingesting.
    """
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from ..operators.dedup_fuzzy import minhash_dedup_pairs, minhash_join

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    data_dir = os.path.join(out_dir, "docs")
    ckpt = os.path.join(out_dir, "_checkpoint")

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        b = batch.persist()
        try:
            internal = (minhash_dedup_pairs(b, threshold=threshold)
                        .select(F.col("doc_b").alias("doc_id")).distinct())
            novel = b.join(internal, "doc_id", "left_anti")
            if os.path.isdir(data_dir) and any(
                    f.endswith(".parquet") for f in os.listdir(data_dir)):
                corpus = spark.read.schema(schema).parquet(data_dir)
                dup = (minhash_join(novel, corpus, threshold=threshold)
                       .select(F.col("doc_a").alias("doc_id")).distinct())
                novel = novel.join(dup, "doc_id", "left_anti")
            novel.write.mode("append").parquet(data_dir)
        finally:
            spark.catalog.clearCache()  # minhash persists, batch persist

    q = (spark.readStream.schema(schema).parquet(src_dir)
         .writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"near-dup ingest drain exceeded {timeout_s}s before completing")


def stream_events_with_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events table plus a FLUSH sentinel file:
    real pipelines close gap-sessions when the event-time clock moves
    past them; a drained (availableNow) run needs something to move
    the clock past the last real event, so the stage directory carries
    a second parquet file with one ``__flush__`` row per user at
    (global max ts + 2h). The stateful operator advances its clock on
    sentinels but never emits them, which makes the final output
    INDEPENDENT of the order the two files are micro-batched in —
    see ``streaming_stateful_sessions``."""
    import tempfile as _tf

    from ..sources.tables import load_tables
    stage = os.path.join(_tf.gettempdir(),
                         "stream_events_" + sf_dir.strip("/")
                         .replace("/", "_"))
    done = os.path.join(stage, "_STAGED")
    # The stage must hold EXACTLY data0/data1/_STAGED: any foreign file
    # (e.g. a raw-events symlink left by an older stream_events that
    # once shared this directory name) becomes an extra micro-batch and
    # double-counts every session. Sweep strays before streaming.
    if os.path.isdir(stage):
        for name in os.listdir(stage):
            if name not in ("data0.parquet", "data1.parquet", "_STAGED"):
                path = os.path.join(stage, name)
                if os.path.islink(path) or os.path.isfile(path):
                    os.unlink(path)
                else:
                    import shutil as _sh
                    _sh.rmtree(path)
    if not os.path.exists(done):
        ev = load_tables(spark, sf_dir)["events"] \
            .select("user_id", "ts", "value", "event_type")
        (ev.coalesce(1).write.mode("overwrite")
           .parquet(os.path.join(stage, "f0")))
        flush = (ev.groupBy("user_id")
                   .agg(F.max("ts").alias("_m"))
                   .select("user_id",
                           (F.col("_m") + F.expr("INTERVAL 2 HOURS"))
                           .alias("ts"),
                           F.lit(0.0).alias("value"),
                           F.lit("__flush__").alias("event_type"))
                   .crossJoin(F.broadcast(
                       ev.agg(F.max("ts").alias("_g"))))
                   .select("user_id",
                           (F.col("_g") + F.expr("INTERVAL 2 HOURS"))
                           .alias("ts"), "value", "event_type"))
        (flush.coalesce(1).write.mode("overwrite")
              .parquet(os.path.join(stage, "f1")))
        # flatten: the file source watches one directory
        import glob
        import shutil
        for i, sub in enumerate(("f0", "f1")):
            src = glob.glob(os.path.join(stage, sub, "part-*.parquet"))[0]
            shutil.copy(src, os.path.join(stage, f"data{i}.parquet"))
            shutil.rmtree(os.path.join(stage, sub))
        open(done, "w").close()
    schema = spark.read.parquet(
        os.path.join(stage, "data0.parquet")).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage))
