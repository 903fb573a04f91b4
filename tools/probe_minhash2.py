"""One-off r12 probe: signature-stage variants for the 128-perm prod
MinHash. Checks exact equality against the current implementation and
times each variant through the noop sink."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.operators import dedup_fuzzy as dfz  # noqa: E402
from precios_nexo_sperant_etl_spark.operators.text import HASH_P  # noqa: E402
from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from precios_nexo_sperant_etl_spark.sources.tables import load_tables  # noqa: E402

N_PERMS = 128


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
    return sorted(runs)[len(runs) // 2]


def numpy_sigs(hashed, id_col="doc_id", n_perms=N_PERMS):
    params = dfz.minhash_params(n_perms)
    a = np.array([p[0] for p in params], dtype=np.int64)
    b = np.array([p[1] for p in params], dtype=np.int64)

    def part(batches):
        accum = {}
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            h = pdf["h"].to_numpy(dtype=np.int64)
            # (n_rows, n_perms): a*h+b < 2^62 + 2^30, no overflow
            vals = (h[:, None] * a[None, :] + b[None, :]) % HASH_P
            frame = pd.DataFrame(vals)
            frame.insert(0, "_id", ids)
            mins = frame.groupby("_id", sort=False).min()
            for did, row in zip(mins.index.to_numpy(), mins.to_numpy()):
                prev = accum.get(did)
                if prev is None:
                    accum[did] = row
                else:
                    np.minimum(prev, row, out=prev)
        if accum:
            out = pd.DataFrame(
                np.vstack(list(accum.values())),
                columns=[f"mh_{i}" for i in range(n_perms)])
            out.insert(0, id_col, list(accum.keys()))
            yield out

    schema = f"{id_col} bigint, " + ", ".join(
        f"mh_{i} bigint" for i in range(n_perms))
    return hashed.repartition(id_col).mapInPandas(part, schema)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe2")
    docs = load_tables(spark, sf_dir)["documents"]
    docs.count()
    hashed = dfz.shingle_hashes(docs).persist()
    print("docs with shingles:", hashed.select("doc_id").distinct().count())

    cur = dfz.minhash_signatures(docs, hashed=hashed, n_perms=N_PERMS)
    timed("A current wide agg", cur)

    rep = (hashed.repartition("doc_id").groupBy("doc_id")
           .agg(*[F.expr(f"min(({a} * h + {b}) % {HASH_P}) AS mh_{i}")
                  for i, (a, b) in enumerate(dfz.minhash_params(N_PERMS))]))
    timed("B repartition+agg", rep)

    np_sigs = numpy_sigs(hashed)
    timed("C numpy mapInPandas", np_sigs)

    # correctness: exact frame equality
    a_rows = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(N_PERMS))
              for r in cur.collect()}
    c_rows = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(N_PERMS))
              for r in np_sigs.collect()}
    assert a_rows == c_rows, "numpy variant drifts from JVM"
    print("C equals A exactly on all docs:", len(a_rows))

    # full-query impact: swap sigs source inside the pipeline by hand
    pairs_c = dfz.minhash_band_pairs(np_sigs, n_bands=16)
    jac_c = dfz.jaccard_pairs(hashed, pairs_c).filter(F.col("jaccard") >= 0.2)
    timed("full query with C sigs (no sort)", jac_c)
    pairs_a = dfz.minhash_band_pairs(cur, n_bands=16)
    jac_a = dfz.jaccard_pairs(hashed, pairs_a).filter(F.col("jaccard") >= 0.2)
    timed("full query with A sigs (no sort)", jac_a)


if __name__ == "__main__":
    main()
