"""One-off r12 probe: single-exchange shingle pipeline clustered by
doc_id — distinct, sig agg and sizes agg all become exchange-free."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.operators import dedup_fuzzy as dfz  # noqa: E402
from precios_nexo_sperant_etl_spark.operators.text import md5_hash  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from precios_nexo_sperant_etl_spark.sources.tables import load_tables  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, df, n=3):
    noop(df)
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        noop(df)
        runs.append(time.perf_counter() - t0)
    print(f"{label}: {sorted(runs)[len(runs)//2]:.3f}  {['%.3f' % r for r in runs]}")


def shingle_hashes_clustered(df, text_col="text", id_col="doc_id", k=3):
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism
    tagged = df.select(F.col(id_col), F.col(text_col),
                       F.monotonically_increasing_id().alias("_row"))
    tagged = tagged.repartition(width, id_col)
    toks = tagged.select(
        F.col(id_col), F.col("_row"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "tok"))
    w = Window.partitionBy(id_col, "_row").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    last = F.lead("tok", k - 1).over(w)
    sh = (toks.select(id_col, F.concat_ws(" ", *leads).alias("sh"),
                      last.alias("_last"))
              .filter(F.col("_last").isNotNull()))
    return sh.select(id_col, md5_hash(F.col("sh")).alias("h")).distinct()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe3")
    docs = load_tables(spark, sf_dir)["documents"]
    docs.count()

    t0 = time.perf_counter()
    hashed = shingle_hashes_clustered(docs).persist()
    n = hashed.count()
    print(f"clustered shingle materialize: {time.perf_counter() - t0:.3f} rows={n} "
          f"parts={hashed.rdd.getNumPartitions()}")

    sigs = dfz.minhash_signatures(docs, hashed=hashed, n_perms=128)
    print("sig agg exchanges:",
          sigs._jdf.queryExecution().executedPlan().toString().count("Exchange"))
    timed("sigs 128 agg on clustered cache", sigs)

    pairs = dfz.minhash_band_pairs(sigs, n_bands=16)
    jac = dfz.jaccard_pairs(hashed, pairs).filter(F.col("jaccard") >= 0.2)
    timed("full prod query (no sort)", jac)

    # correctness vs current shingle_hashes
    cur = dfz.shingle_hashes(docs)
    a = set(map(tuple, cur.collect()))
    b = set(map(tuple, hashed.collect()))
    assert a == b, "clustered shingles drift"
    print("shingle sets identical:", len(a))

    cur_sig = dfz.minhash_signatures(docs, n_perms=128)
    sa = {r["doc_id"]: tuple(r[i] for i in range(1, 129)) for r in cur_sig.collect()}
    sb = {r["doc_id"]: tuple(r[i] for i in range(1, 129)) for r in sigs.collect()}
    assert sa == sb, "sig drift"
    print("sigs identical")


if __name__ == "__main__":
    main()
