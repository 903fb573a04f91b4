"""The reference's price-update pipeline (§3.1 of SURVEY.md) as one lazy
Spark plan over the synthetic star schema.

Role mapping (FIXTURES.md §B): ``customer`` plays the unified Nexo unit
table (existing price = ``c_acctbal``, existing state = ``c_mktsegment``,
project analog = nation); the *latest order per customer* plays the
Sperant CRM snapshot (new price = ``o_totalprice``, new state =
``o_orderstatus``). The pipeline spine is identical to
Actualizar_Precios_de_Nexo.py stages 4-11:

    normalize keys → dedup right by latest date (W1) → LEFT broadcast
    join (J1) → coalesce-update (F14) → change flags (F16-F19) → audit
    aggregate (A1/A7)

Physical shape (verified via ``.explain('formatted')``): the orders-side
dedup is the only wide shuffle; the join against the deduped snapshot and
the nation lookup are both broadcast hash joins; the final groupBy reduces
map-side to ≤|nations| rows per partition before its shuffle. At 100 TB
the fact scan never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.audit import audit_summary, change_flags
from ..operators.dedup import dedup_keep_latest
from ..operators.join import match_flags
from ..operators.update import coalesce_update
from ..sources.tables import load_tables


def latest_order_snapshot(orders: DataFrame) -> DataFrame:
    """One row per customer: their most recent order (W1 dedup).

    Latest ``o_orderdate`` wins; ties break on highest ``o_orderkey``
    (the explicit stand-in for the reference's positional last-wins rule).
    """
    snap = dedup_keep_latest(orders, ["o_custkey"], "o_orderdate",
                             tiebreak="o_orderkey")
    return snap.select("o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate")


def core_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 4-9: enrich every customer with its latest-order snapshot and
    apply the coalesce update rules. Preserves customer cardinality."""
    t = load_tables(spark, sf_dir)
    snap = latest_order_snapshot(t["orders"])
    # No broadcast hint on the snapshot: it is one row per
    # customer-with-orders, so it GROWS with the fact side's key
    # cardinality — an explicit hint overrides every size check and
    # would OOM the driver at scale instead of demoting. Catalyst/AQE
    # still broadcast it whenever its runtime size fits the threshold
    # (it does at test scale); past that the join degrades gracefully
    # to sort-merge. The genuinely bounded dimension (nation, below)
    # keeps its hint.
    enriched = (
        t["customer"]
        .withColumnRenamed("c_acctbal", "precio_antes")
        .withColumnRenamed("c_mktsegment", "estado_antes")
        .join(snap, F.col("c_custkey") == F.col("o_custkey"), "left")
    )
    enriched = match_flags(enriched, marker="o_custkey")
    enriched = (enriched
                .withColumn("precio_despues",
                            coalesce_update(F.col("precio_antes"), F.col("o_totalprice")))
                .withColumn("estado_despues",
                            coalesce_update(F.col("estado_antes"), F.col("o_orderstatus"))))
    nation = broadcast(t["nation"].select("n_nationkey", "n_name"))
    return (enriched
            .join(nation, enriched["c_nationkey"] == nation["n_nationkey"], "inner")
            .select("c_custkey", "n_name", "precio_antes", "estado_antes",
                    "precio_despues", "estado_despues", "tiene_match", "Sin_Match"))


def core_update_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 10-11: per-nation audit summary — the flagship query."""
    flagged = change_flags(
        core_enriched(spark, sf_dir),
        price_before="precio_antes", price_after="precio_despues",
        state_before="estado_antes", state_after="estado_despues",
    )
    return (audit_summary(flagged, group_col="n_name")
            .repartition(1).sortWithinPartitions("n_name"))
