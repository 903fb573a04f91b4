"""End-to-end lake job: curate → split → pack → partitioned write +
manifest. Pins the product contract: partition layout readable by
pruning, manifest totals consistent with the files, idempotent re-run."""

import glob
import json
import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_prep_to_lake_roundtrip(spark, tmp_path):
    from precios_nexo_sperant_etl_spark.plans.prep_to_lake import prep_to_lake

    out = str(tmp_path / "lake")
    manifest = prep_to_lake(spark, SF_DIR, out, budget=512)

    # partition layout: lang=*/split=* directories with parquet files
    parts = glob.glob(os.path.join(out, "sequences", "lang=*", "split=*"))
    assert parts, "no partition directories written"
    assert {"train", "val", "test"} >= {
        p.split("split=")[1] for p in parts}

    # manifest agrees with what a reader sees
    written = spark.read.parquet(os.path.join(out, "sequences"))
    assert written.count() == manifest["total_docs"]
    got_tokens = written.agg(F.sum("n_tokens")).collect()[0][0]
    assert got_tokens == manifest["total_tokens"]
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest

    # every sequence respects the budget unless it is a single long doc
    over = (written.groupBy("lang", "split", "seq_id")
            .agg(F.sum("n_tokens").alias("fill"),
                 F.count(F.lit(1)).alias("n"))
            .filter((F.col("fill") > 512) & (F.col("n") > 1)))
    assert over.count() == 0

    # partition pruning: a per-shard read sees only that shard's rows
    one = manifest["shards"][0]
    shard = spark.read.parquet(os.path.join(out, "sequences")).filter(
        (F.col("lang") == one["lang"]) & (F.col("split") == one["split"]))
    assert shard.count() == one["n_docs"]
    plan = shard._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    # idempotent: re-run converges to the same manifest
    again = prep_to_lake(spark, SF_DIR, out, budget=512)
    assert again == manifest
