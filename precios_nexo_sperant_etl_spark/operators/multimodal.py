"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/transformed through Arrow-batched pandas iterators.

The decode libraries (PIL, torchaudio, …) are deliberately NOT imported —
this container doesn't ship them, and at 100 TB the *plumbing* is the hard
part anyway: binary columns must flow through parquet scans untouched
(no stringification), decoding must happen in Arrow batches (one Python
crossing per batch, not per row), and partition sizing must account for
payload bytes, not row counts (``spark.sql.files.maxPartitionBytes``).

Real decoding slots into ``decode_batch`` below; everything around it —
schema, batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

#: Output schema of the feature-extraction pass.
FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
    StructField("content_md5", StringType()),
])


def attach_binary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary payload column (here: the UTF-8 bytes
    of the text — a stand-in for image/audio blobs) plus typed metadata."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode: deterministic fake 'image dimensions' from byte length.

    Replace the body with e.g. ``PIL.Image.open(io.BytesIO(p))`` per
    payload; the signature (Series of bytes in, DataFrame of features
    out) is the real Arrow-batch contract.
    """
    lengths = payloads.map(len)
    return pd.DataFrame({
        "byte_len": lengths.astype("int64"),
        "fake_width": (lengths % 640).astype("int64"),
        "fake_height": (lengths % 480).astype("int64"),
    })


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    ``mapInPandas`` — one Python crossing per batch. ``content_md5`` is
    computed JVM-side (cheap, stays in codegen); only the simulated
    decode crosses into Python."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = decode_batch(pdf["payload"])
            feats.insert(0, "doc_id", pdf["doc_id"].astype("int64").values)
            feats["content_md5"] = [
                hashlib.md5(p).hexdigest() for p in pdf["payload"]
            ]
            yield feats

    return binary_df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def real_decode_placeholder(payload: bytes) -> None:
    """Where a real image/audio decoder would plug in. Kept explicit so
    the gap is visible and tested as such."""
    raise NotImplementedError(
        "media decoding libraries are not available in this environment; "
        "wire PIL/torchaudio/ffmpeg into decode_batch for real payloads")


def frame_sample_schedule(binary_df: DataFrame, interval_ms: int = 1000,
                          max_frames: int = 8,
                          id_col: str = "doc_id") -> DataFrame:
    """Deterministic frame-sampling schedule from typed metadata — the
    PLANNING half of video frame extraction, all in the engine: one
    sample every ``interval_ms`` capped at ``max_frames``, evenly from
    t=0. The decode half (actually seeking those timestamps) stays
    behind the mapInPandas seam like every other media touch.

    Duration is derived from the stand-in metadata (10 ms per payload
    byte) the same way real pipelines read it from a container-header
    probe — the schedule math is what this operator pins. Narrow map:
    sequence + explode, no shuffle; output rows ≤ max_frames per media
    row regardless of duration skew.
    """
    dur = (F.col("meta.byte_len") * 10).alias("duration_ms")
    n = F.least(F.lit(max_frames),
                F.ceil(dur / F.lit(interval_ms))).cast("int")
    return (binary_df.select(F.col(id_col), dur, n.alias("n_frames"))
            .filter(F.col("n_frames") > 0)
            .select(id_col, "duration_ms", "n_frames",
                    F.explode(F.expr("sequence(0, n_frames - 1)"))
                     .alias("frame_idx"))
            .select(F.col(id_col), F.col("duration_ms"), F.col("n_frames"),
                    F.col("frame_idx"),
                    (F.col("frame_idx").cast("long") * interval_ms)
                     .alias("sample_ms")))
