"""Bucketed co-located join: pre-bucketing both sides of the fact-fact
join on the join key removes the per-query shuffle entirely (the
SCALING.md Q5 note, demonstrated). At 100 TB this converts the biggest
recurring exchange into a one-time write-side cost."""

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    from precios_nexo_sperant_etl_spark.sources.sinks import write_bucketed

    # writes to the session's default warehouse (./spark-warehouse, gitignored)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "lineitem_b", ["o_orderkey"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table("lineitem_b")
                  .join(spark.table("orders_b"), "o_orderkey")
                  .groupBy("o_orderstatus").count())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself runs shuffle-free on co-bucketed scans
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is still correct
        got = {r["o_orderstatus"]: r["count"] for r in joined.collect()}
        want = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
                .withColumnRenamed("l_orderkey", "o_orderkey")
                .join(spark.read.parquet(f"{SF_DIR}/orders.parquet"), "o_orderkey")
                .groupBy("o_orderstatus").count().collect())
        assert got == {r["o_orderstatus"]: r["count"] for r in want}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
