"""sf0.1 → sf1 scaling exponents for the most expensive exec queries
(VERDICT r7 item 4): run each registry query at both scales on the
same session, and report the per-query scaling exponent
``log(t_sf1 / t_sf01) / log(k)`` — 1.0 is linear-per-row, anything
well above ~1.2 names a super-linear cost to fix.

The sf1 fixture is the FK-consistent ×10 replication from
``tools/gen_sf_synth.py`` (isomorphic dup structure — see its
docstring). Each query gets one untimed warmup at sf0.1 (JIT, Python
worker pool, IVF memo) before the timed runs; timed runs execute
``.count()`` to force full materialization without driver collect.

Usage: python tools/scale_stress_sf1.py [sf01_dir] [sf1_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from precios_nexo_sperant_etl_spark import registry  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "png_decode_roundtrip", "webdataset_roundtrip", "simhash_near_pairs",
    "minhash_dedup_pairs_prod", "rrf_hybrid_retrieval",
    "cc_largestar_equivalence", "domain_dedup_datasheet",
    "exact_substring_coverage", "item_item_copurchase",
    "core_update_audit",
]


def run_once(fn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    return time.time() - t0, n


def main() -> None:
    args = [a for a in sys.argv[1:]]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf01 = args[0] if args else "/root/testdata/sf0.1"
    sf1 = args[1] if len(args) > 1 else "/tmp/sf1_synth"
    names = args[2:] or DEFAULT_QUERIES
    k = 10.0
    if vanilla:
        # the driver's session shape (VERDICT r9 item 6): no tuned SQL
        # confs, so measured exponents hold under the vanilla runtime
        # too. driver.memory stays at the tuned session's 8g — heap is
        # machine provisioning, not query tuning: Spark's 1g default
        # cannot even build an AQE-elected ~10MB-wire broadcast relation
        # (~10x expanded in-heap) next to a persisted frame at sf1, and
        # no real cluster runs 1g drivers against 100 TB.
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .appName("sf1-vanilla")
                 .config("spark.driver.memory",
                         os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
    else:
        spark = get_spark()
    qs = registry.queries()
    rows = []
    for name in names:
        fn = qs[name]
        run_once(fn, spark, sf01)                    # warmup
        t01, n01 = run_once(fn, spark, sf01)
        t1, n1 = run_once(fn, spark, sf1)
        exp = math.log(max(t1, 1e-3) / max(t01, 1e-3)) / math.log(k)
        rows.append({"query": name, "t_sf01": round(t01, 2),
                     "t_sf1": round(t1, 2), "rows_sf01": n01,
                     "rows_sf1": n1, "exponent": round(exp, 2)})
        print(json.dumps(rows[-1]), flush=True)
    print("RESULT " + json.dumps(rows))


if __name__ == "__main__":
    main()
