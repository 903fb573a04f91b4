"""One-off r12 probe: where does minhash_dedup_pairs_prod spend time?
Times each stage of the pipeline in isolation (noop sink), at the
session's core count."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.operators import dedup_fuzzy as dfz  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from precios_nexo_sperant_etl_spark.sources.tables import load_tables  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, df, n=3):
    noop(df)  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        noop(df)
        runs.append(time.perf_counter() - t0)
    print(f"{label}: {sorted(runs)[len(runs)//2]:.3f}  {['%.3f' % r for r in runs]}")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe")
    docs = load_tables(spark, sf_dir)["documents"]
    docs.count()

    t0 = time.perf_counter()
    hashed = dfz.shingle_hashes(docs).persist()
    n = hashed.count()
    print(f"shingle_hashes materialize: {time.perf_counter() - t0:.3f}  rows={n}")

    timed("hashed scan (cached)", hashed)
    sigs = dfz.minhash_signatures(docs, hashed=hashed, n_perms=128)
    timed("sigs 128-wide agg", sigs)
    sigs8 = dfz.minhash_signatures(docs, hashed=hashed, n_perms=8)
    timed("sigs 8-wide agg", sigs8)
    pairs = dfz.minhash_band_pairs(sigs, n_bands=16)
    timed("pairs (sig+bands+buckets)", pairs)
    jac = dfz.jaccard_pairs(hashed, pairs)
    timed("jaccard full (no sort)", jac.filter(F.col("jaccard") >= 0.2))


if __name__ == "__main__":
    main()
