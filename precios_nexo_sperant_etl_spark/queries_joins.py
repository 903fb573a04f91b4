"""Join-heavy analytical queries (TPC-H-shaped) — bench anchors that
exercise multi-way broadcast/shuffle joins, semi-join pushdown, and
JSON extraction, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

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
# Q4-shaped: orders with at least one late line — LEFT SEMI join (the
# physical operator behind EXISTS; J2's flag variant is in the flagship)
# ---------------------------------------------------------------------------

def _q4(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    exists = o.join(late, (F.col("o_orderkey") == F.col("l_orderkey"))
                    & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
    return (exists.groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("order_count"))
                  .orderBy("o_orderpriority"))


register(
    "tpch_q4_order_priority",
    _q4,
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc="Q4-shaped: EXISTS as a LEFT SEMI join with a non-equi residual.",
)

# ---------------------------------------------------------------------------
# Q12-shaped: order-priority counts by line status (join + conditional agg)
# ---------------------------------------------------------------------------

def _q12(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linestatus")
    o = t["orders"].select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("l_linestatus")
              .agg(F.sum(high.cast("int")).cast("long").alias("high_line_count"),
                   F.sum((~high).cast("int")).cast("long").alias("low_line_count"))
              .orderBy("l_linestatus"))


register(
    "tpch_q12_priority_shipping",
    _q12,
    """
SELECT l_linestatus,
       COUNT(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       COUNT(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
""",
    doc="Q12-shaped: fact-fact join + conditional boolean-sum aggregation.",
)

# ---------------------------------------------------------------------------
# Q14-shaped: promo revenue share (join + ratio of conditional decimal sums)
# ---------------------------------------------------------------------------

def _q14(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf)
    li = t["lineitem"].select("l_partkey", "l_extendedprice", "l_discount")
    p = t["part"].select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    promo = F.col("p_type") == "PROMO"
    joined = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (F.lit(100.0)
         * F.sum(F.when(promo, disc).otherwise(F.lit(0).cast("decimal(18,4)")))
             .cast("double")
         / F.sum(disc).cast("double")).alias("promo_revenue_pct"))


register(
    "tpch_q14_promo_revenue",
    _q14,
    """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
    doc="Q14-shaped: dimension join + conditional decimal sums ratio.",
)

# ---------------------------------------------------------------------------
# §3.3 serving loop as ONE query: filter → search → chart agg over the view
# ---------------------------------------------------------------------------

def _serving(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.pivot import pct_within_group
    from .operators.serve import equality_filters, global_search
    view = equality_filters(_t(spark, sf, "orders"), {"o_orderstatus": "F"})
    view = global_search(view.withColumn("key_str", F.col("o_orderkey").cast("string")),
                         "7", columns=["o_orderpriority", "key_str"]).drop("key_str")
    return pct_within_group(view, "o_orderstatus", "o_orderpriority")


register(
    "serving_filtered_chart",
    _serving,
    """
WITH view AS (
  SELECT * FROM orders
  WHERE o_orderstatus = 'F'
    AND contains(lower(concat_ws(chr(31), o_orderpriority,
                                 CAST(o_orderkey AS VARCHAR))), '7')),
counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS count
  FROM view GROUP BY 1, 2)
SELECT o_orderstatus, o_orderpriority, count,
       CAST(round_even(CAST(100 * count / SUM(count) OVER (PARTITION BY o_orderstatus)
                       AS DECIMAL(20,17)), 2) AS DOUBLE) AS pct
FROM counts
""",
    doc="§3.3 dashboard loop: dropdown filter + search + chart agg on the view.",
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
