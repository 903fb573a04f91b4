"""Chunking, SemDeDup, and Z-order layout invariants.

These pin the SEMANTIC contracts (coverage, survivor rules, bit layout)
that the value-hash oracles can't express as readably: every token is
covered by a chunk, consecutive chunks overlap by exactly
``chunk_size - step``, the min-id member of every semantic dup pair
survives SemDeDup, and the Morton key interleaves bits exactly.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def chunked(spark):
    from precios_nexo_sperant_etl_spark.operators.text import chunk_documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (docs, chunk_documents(docs, chunk_size=32, step=24).cache())


def test_chunks_cover_every_token(spark, chunked):
    docs, ch = chunked
    # Σ per-doc (last chunk_start + last chunk size) reaches n_tokens:
    # the final chunk ends exactly at the document's last token.
    last = (ch.groupBy("doc_id")
              .agg(F.max(F.col("chunk_start") + F.col("n_chunk_tokens"))
                   .alias("covered")))
    ntok = docs.select("doc_id",
                       F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
    bad = last.join(ntok, "doc_id").filter(F.col("covered") != F.col("n"))
    assert bad.count() == 0


def test_chunk_overlap_and_stride(spark, chunked):
    _, ch = chunked
    # chunk c starts at c*step and holds min(chunk_size, n - start)
    # tokens; a non-final chunk always has > step tokens (its successor's
    # start exists), so consecutive full chunks share chunk_size - step.
    assert ch.filter(F.col("chunk_start") != F.col("chunk_id") * 24).count() == 0
    nonfinal = (ch.withColumn(
        "is_last",
        F.col("chunk_id") == F.max("chunk_id").over(
            __import__("pyspark").sql.Window.partitionBy("doc_id")))
        .filter(~F.col("is_last")))
    assert nonfinal.filter(F.col("n_chunk_tokens") <= 24).count() == 0


def test_chunk_reconstruction_roundtrip(spark, chunked):
    # Concatenating each chunk's not-yet-covered suffix, in chunk order,
    # reproduces the original token stream exactly (no token lost or
    # duplicated by the overlap scheme). Driver-side at this tiny sf.
    import re

    docs, ch = chunked
    orig = {r["doc_id"]: re.split(r"\s+", r["text"].strip())
            for r in docs.select("doc_id", "text").collect()}
    by_doc = {}
    for r in ch.select("doc_id", "chunk_id", "chunk_start",
                       "chunk_text").collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["chunk_text"]))
    assert set(by_doc) == set(orig)
    for doc_id, pieces in by_doc.items():
        rebuilt = []
        for _, start, ctext in sorted(pieces):
            ctoks = ctext.split(" ")
            rebuilt += ctoks[max(0, len(rebuilt) - start):]
        assert rebuilt == orig[doc_id], doc_id


# ---------------------------------------------------------------------------
# semdedup_survivors
# ---------------------------------------------------------------------------

def test_semdedup_survivor_rules(spark):
    from precios_nexo_sperant_etl_spark.functions.exact import ddot
    from precios_nexo_sperant_etl_spark.operators.similarity import (
        assign_kmeans_cells, semdedup_survivors)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    tau = 0.35
    surv = semdedup_survivors(emb, threshold=tau).cache()
    n_all = emb.count()
    n_surv = surv.count()
    assert 0 < n_surv <= n_all

    # Exhaustive within-cell pair check at this tiny sf: a survivor pair
    # in the same cell must be below tau; every dropped id must have a
    # surviving-or-dropped lower-id neighbor >= tau in its cell.
    cells = assign_kmeans_cells(emb)
    a = cells.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"),
                     "cell")
    b = cells.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"),
                     "cell")
    cos = (ddot(F.col("va"), F.col("vb"))
           / (F.sqrt(ddot(F.col("va"), F.col("va")))
              * F.sqrt(ddot(F.col("vb"), F.col("vb")))))
    pairs = (a.join(b, "cell").filter(F.col("ia") < F.col("ib"))
              .select("ia", "ib", cos.alias("c")).cache())
    sids = {r["vec_id"] for r in surv.collect()}
    close = pairs.filter(F.col("c") >= tau).collect()
    assert len(close) > 0, "fixture has no semantic dups; test is vacuous"
    for r in close:
        # the higher id of any close pair must NOT have survived
        assert r["ib"] not in sids
    dropped = {r["ib"] for r in close}
    all_ids = {r["vec_id"] for r in cells.select("vec_id").collect()}
    assert sids == all_ids - dropped
    pairs.unpersist()
    surv.unpersist()


# ---------------------------------------------------------------------------
# zorder_key
# ---------------------------------------------------------------------------

def test_zorder_bit_interleave_exact(spark):
    from precios_nexo_sperant_etl_spark.operators.layout import zorder_key

    rows = [(0b1011, 0b0110), (0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = [r["z"] for r in
           df.select(zorder_key(F.col("x"), F.col("y"), 16).alias("z"))
             .collect()]

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(x, y) for x, y in rows]
    # z=... interleaves: x=1,y=0 -> 1; x=0,y=1 -> 2
    assert got[3] == 1 and got[4] == 2


def test_zorder_duck_twin_matches(spark):
    from precios_nexo_sperant_etl_spark.operators.layout import (
        duck_zorder_key, zorder_key)

    rows = [(i * 7919 % 65536, i * 104729 % 65536) for i in range(100)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = [r["z"] for r in
           df.select(zorder_key(F.col("x"), F.col("y"), 16).alias("z"))
             .orderBy("x").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x INT, y INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [r[0] for r in con.execute(
        f"SELECT {duck_zorder_key('x', 'y', 16)} FROM t ORDER BY x"
    ).fetchall()]
    assert got == want


def test_zorder_locality_beats_single_sort(spark):
    """The property that justifies the operator: bucketing by zkey gives
    per-bucket ranges that are narrow in BOTH dimensions, while
    single-column sort leaves the other dimension's range at ~full
    width. Measured on real orders data."""
    from precios_nexo_sperant_etl_spark.operators.layout import zorder_key

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    x = F.col("o_custkey")
    y = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    stats = (o.select(x.alias("ck"), y.alias("dy"),
                      zorder_key(x, y, 16).alias("z"))
              .groupBy(F.shiftright(F.col("z"), 12).alias("b"))
              .agg((F.max("ck") - F.min("ck")).alias("wx"),
                   (F.max("dy") - F.min("dy")).alias("wy"))
              .agg(F.avg("wx").alias("ax"), F.avg("wy").alias("ay"))
              .collect()[0])
    full = o.select((F.max(x) - F.min(x)).alias("fx")).collect()[0]["fx"]
    fully = (o.select(y.alias("dy"))
              .agg(F.max("dy") - F.min("dy")).collect()[0][0])
    # both dims' average per-bucket width well under the full span
    assert stats["ax"] < 0.7 * full
    assert stats["ay"] < 0.7 * fully
