"""Core relational queries (SURVEY §2 inventory) with DuckDB oracles.

Role mapping onto the synthetic star schema follows FIXTURES.md §B:
customer = unit inventory, latest-order-per-customer = CRM snapshot,
nation = project.
"""

from __future__ import annotations

from .plans.price_pipeline import core_enriched, core_update_audit, latest_order_snapshot
from .operators.join import key_set_difference
from .registry import register
from .sources.tables import load_tables

# ---------------------------------------------------------------------------
# Flagship: the full §3.1 pipeline (W1 + J1 + J2 + F14 + F16-F19 + A1 + A7)
# ---------------------------------------------------------------------------

_ISCLOSE = ("""NOT (CASE WHEN precio_antes IS NULL AND precio_despues IS NULL THEN TRUE
         ELSE COALESCE(abs(precio_antes - precio_despues)
                       <= 1e-8 + 1e-5 * abs(precio_despues), FALSE) END)""")

_ORACLE_ENRICHED = """
WITH snap AS (
  SELECT o_custkey, o_totalprice, o_orderstatus FROM (
    SELECT o_custkey, o_totalprice, o_orderstatus,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC NULLS FIRST, o_orderkey DESC) AS rn
    FROM orders) t WHERE rn = 1),
enriched AS (
  SELECT c.c_custkey, n.n_name,
         c.c_acctbal    AS precio_antes,
         c.c_mktsegment AS estado_antes,
         COALESCE(s.o_totalprice, c.c_acctbal)     AS precio_despues,
         COALESCE(s.o_orderstatus, c.c_mktsegment) AS estado_despues,
         s.o_custkey IS NOT NULL AS tiene_match,
         s.o_custkey IS NULL     AS "Sin_Match"
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  LEFT JOIN snap s ON c.c_custkey = s.o_custkey)
"""

register(
    "core_update_audit",
    lambda spark, sf: core_update_audit(spark, sf),
    _ORACLE_ENRICHED + f"""
, flagged AS (
  SELECT n_name, tiene_match, "Sin_Match" AS sin_match,
         {_ISCLOSE} AS cambio_precio,
         estado_antes IS DISTINCT FROM estado_despues AS cambio_estado
  FROM enriched)
SELECT n_name,
  COUNT(*)                                    AS "Registros",
  COUNT(*) FILTER (tiene_match)               AS "Con_Match",
  COUNT(*) FILTER (sin_match)                 AS "Sin_Match",
  COUNT(*) FILTER (cambio_precio OR cambio_estado) AS "Cambios",
  COUNT(*) FILTER (cambio_precio)             AS "Cambios_Precio",
  COUNT(*) FILTER (cambio_estado)             AS "Cambios_Estado",
  COUNT(*) FILTER (NOT (cambio_precio OR cambio_estado) AND tiene_match) AS "Sin_Cambio",
  CAST(round_even(CAST(COUNT(*) FILTER (tiene_match)::DOUBLE / COUNT(*) AS DECIMAL(20,17)), 4) AS DOUBLE) AS "pct_Con_Match",
  CAST(round_even(CAST(COUNT(*) FILTER (sin_match)::DOUBLE / COUNT(*) AS DECIMAL(20,17)), 4) AS DOUBLE)   AS "pct_Sin_Match",
  CAST(round_even(CAST(COUNT(*) FILTER (cambio_precio OR cambio_estado)::DOUBLE / COUNT(*) AS DECIMAL(20,17)), 4) AS DOUBLE) AS "pct_Cambios",
  CAST(round_even(CAST(COUNT(*) FILTER (NOT (cambio_precio OR cambio_estado) AND tiene_match)::DOUBLE
        / COUNT(*) AS DECIMAL(20,17)), 4) AS DOUBLE) AS "pct_Sin_Cambio"
FROM flagged GROUP BY n_name ORDER BY n_name
""",
    doc="Full §3.1 pipeline: W1 dedup → broadcast left join → coalesce update → audit agg.",
)

register(
    "j1_left_enrich_coalesce",
    lambda spark, sf: core_enriched(spark, sf),
    _ORACLE_ENRICHED + """
SELECT c_custkey, n_name, precio_antes, estado_antes,
       precio_despues, estado_despues, tiene_match, "Sin_Match"
FROM enriched
""",
    doc="J1 left broadcast join + J2 match flags + F14 coalesce update.",
)

register(
    "w1_dedup_latest",
    lambda spark, sf: latest_order_snapshot(load_tables(spark, sf)["orders"]),
    """
SELECT o_custkey, o_totalprice, o_orderstatus, o_orderdate FROM (
  SELECT o_custkey, o_totalprice, o_orderstatus, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC NULLS FIRST, o_orderkey DESC) AS rn
  FROM orders) t WHERE rn = 1
""",
    doc="W1 window dedup: keep latest row per key with deterministic tiebreak.",
)

register(
    "j4_key_set_difference",
    lambda spark, sf: key_set_difference(
        load_tables(spark, sf)["customer"],
        load_tables(spark, sf)["orders"],
        "c_custkey", "o_custkey"),
    """
SELECT DISTINCT c_custkey AS key
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY key
""",
    doc="J4/U2 set difference on keys via left-anti join.",
)
