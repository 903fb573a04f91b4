"""Join-heavy analytical queries (TPC-H-shaped) — bench anchors that
exercise multi-way broadcast/shuffle joins, semi-join pushdown, and
JSON extraction, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .functions.exact import dsum
from .registry import register
from .sources.tables import load_tables

_DEC = "DECIMAL(18,2)"


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_tables(spark, sf)[name]


# ---------------------------------------------------------------------------
# Q3-shaped: shipping priority — 3-way join, agg, deterministic top-k
# ---------------------------------------------------------------------------

def _q3(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf)
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING") \
                        .select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff) \
                        .select("o_orderkey", "o_custkey", "o_orderdate")
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff) \
                      .select("l_orderkey", "l_extendedprice", "l_discount")
    disc = (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    return (li.join(broadcast(orders.join(broadcast(cust),
                                          orders["o_custkey"] == cust["c_custkey"])),
                    F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(disc).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


register(
    "tpch_q3_shipping_priority",
    _q3,
    """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
""",
    doc="Q3-shaped: selective dims broadcast into the fact scan, top-k.",
)

# ---------------------------------------------------------------------------
# Q5-shaped: revenue by nation — join chain through nation/region
# ---------------------------------------------------------------------------

def _q5(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf)
    region = t["region"].filter(F.col("r_name") == "REGION_0").select("r_regionkey")
    nation = (t["nation"].join(broadcast(region),
                               F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    cust = (t["customer"].join(broadcast(nation),
                               F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "n_name"))
    orders = t["orders"].select("o_orderkey", "o_custkey")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    disc = (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
              .groupBy("n_name")
              .agg(F.sum(disc).cast("double").alias("revenue"))
              .orderBy("n_name"))


register(
    "tpch_q5_nation_revenue",
    _q5,
    """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM region, nation, customer, orders, lineitem
WHERE r_name = 'REGION_0' AND n_regionkey = r_regionkey
  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
  AND l_orderkey = o_orderkey
GROUP BY n_name ORDER BY n_name
""",
    doc="Q5-shaped join chain: region→nation→customer broadcast, fact joins.",
)

# ---------------------------------------------------------------------------
# Q6-shaped: selective-predicate revenue (pure scan + pushdown showcase)
# ---------------------------------------------------------------------------

def _q6(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24))
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * F.col("l_discount").cast("decimal(4,2)"))
    return sel.agg(F.sum(rev).cast("double").alias("revenue"),
                   F.count(F.lit(1)).alias("n_rows"))


register(
    "tpch_q6_forecast_revenue",
    _q6,
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="Q6-shaped: every predicate pushed to the parquet scan.",
)

# ---------------------------------------------------------------------------
# JSON props extraction over events (the one semi-structured column)
# ---------------------------------------------------------------------------

register(
    "events_props_json",
    lambda spark, sf: _t(spark, sf, "events")
        .select("event_id",
                F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"))
        .filter(F.col("k").isNotNull()),
    """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
""",
    doc="JSON field extraction from the semi-structured props column.",
)
