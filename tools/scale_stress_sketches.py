"""Sketch scale-stress: explode the sf0.1 documents ×k (same isomorphic
replication as scale_stress.py) and verify the sketch cost model — wall
time tracks the SCAN (linear in k) while the shuffled state stays
constant at the sketch geometry (d·w counters / m registers per group /
≤m bloom bits), because map-side combine performs the merge.

Reports per k: corpus rows, wall for CMS counter build, HLL register
build, and histogram build, plus the reduce-side row counts (must NOT
grow with k).

Usage: python tools/scale_stress_sketches.py [sf_dir] [k ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.operators.sketches import (  # noqa: E402
    cms_counters, hll_registers)
from precios_nexo_sperant_etl_spark.operators.text import tokens  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from scale_stress import exploded_docs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(a) for a in sys.argv[2:]] or [1, 3, 10]
    spark = get_spark(app_name="sketch-stress")
    for k in ks:
        docs = exploded_docs(spark, sf_dir, k).persist()
        n = docs.count()

        items = (docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("term"))
            .where(F.col("term") != ""))

        t0 = time.time()
        terms = (items.groupBy("term")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        cms_rows = cms_counters(terms, "term", "cnt", 4, 256).count()
        t_cms = time.time() - t0

        t0 = time.time()
        hll_rows = hll_registers(items, "term", ["source"], p=6).count()
        t_hll = time.time() - t0

        t0 = time.time()
        # exploded_docs drops n_chars for k>1 — derive the value from
        # the (replica-rewritten) text so all k run the same expression
        o = docs.select("source", F.length("text").cast("long").alias("v"))
        rng = o.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        hist_rows = (o.crossJoin(F.broadcast(rng))
                     .select("source",
                             F.expr("((v - lo) * 64) div (hi - lo + 1)")
                             .alias("bin"))
                     .groupBy("source", "bin").count().count())
        t_hist = time.time() - t0

        print(json.dumps({
            "k": k, "rows": n,
            "cms_wall_s": round(t_cms, 2), "cms_state_rows": cms_rows,
            "hll_wall_s": round(t_hll, 2), "hll_state_rows": hll_rows,
            "hist_wall_s": round(t_hist, 2), "hist_state_rows": hist_rows,
        }))
        docs.unpersist()


if __name__ == "__main__":
    main()
