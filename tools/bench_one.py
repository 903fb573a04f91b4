"""Isolated per-query timing + plan capture (optimization rounds).

Times one or more registered queries with EXACTLY the bench.py
methodology — construct, one untimed warm-up noop write, then three
timed noop writes (median reported) — on the tuned session, and
optionally writes ``.explain("formatted")`` to a file.

Usage:
  python tools/bench_one.py [--sf DIR] [--plan-dir plans/r11 --suffix before] query ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from precios_nexo_sperant_etl_spark.registry import queries  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from precios_nexo_sperant_etl_spark.sources.tables import load_tables  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None,
                    help="write <query>_<suffix>.txt explain output here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plan-only", action="store_true",
                    help="construct + explain only, no execution")
    args = ap.parse_args()

    spark = get_spark(app_name="bench_one")
    qs = queries()
    load_tables(spark, args.sf)["nation"].count()  # session warm-up

    out = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"bench_one: {name}")
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        construct = time.perf_counter() - t0
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(args.plan_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        if args.plan_only:
            print(json.dumps({name: {"construct": round(construct, 3)}}),
                  flush=True)
            spark.catalog.clearCache()
            continue
        df.write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"construct": round(construct, 3),
                     "median": round(statistics.median(runs), 3),
                     "trials": runs}
        print(json.dumps({name: out[name]}), flush=True)
        spark.catalog.clearCache()
    print("TOTAL_MEDIAN", round(sum(v["median"] for v in out.values()), 3))


if __name__ == "__main__":
    main()
