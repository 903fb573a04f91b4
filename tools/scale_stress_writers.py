"""sf0.1 → sf1 scaling rows for the part-file WRITE formats
(VERDICT r10 item 7): time ``df.write.format("xlsx"/"tfrecord"/
"warc")`` over the documents table at both scales, and sweep
rows-per-partition for the xlsx writer to locate its buffering knee —
the workbook format forces the writer to hold one partition's rows in
memory (a .xlsx is one zip member per sheet, sized up-front), so
partition sizing is the lever that keeps executor memory flat.

Usage: python tools/scale_stress_writers.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from precios_nexo_sperant_etl_spark.session import get_spark  # noqa: E402
from precios_nexo_sperant_etl_spark.sources.spark_datasource import (  # noqa: E402
    register_data_sources)
from precios_nexo_sperant_etl_spark.sources.tables import (  # noqa: E402
    load_tables)


def timed_write(df, fmt: str, n_parts: int, **options) -> float:
    out = tempfile.mkdtemp(prefix=f"wstress_{fmt}_")
    try:
        t0 = time.perf_counter()
        w = df.repartition(n_parts).write.format(fmt).mode("append")
        for k, v in options.items():
            w = w.option(k, v)
        w.save(out)
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    spark = get_spark(app_name="writer-stress")
    register_data_sources(spark)

    def frames(sf_dir):
        d = load_tables(spark, sf_dir)["documents"]
        xlsx = d.select("doc_id", "lang", "source", "text")
        tfr = d.select(F.encode("text", "utf-8").alias("record"))
        warc = d.select(F.lit("response").alias("warc_type"),
                        F.format_string("<urn:doc:%d>", "doc_id")
                         .alias("record_id"),
                        F.encode("text", "utf-8").alias("payload"))
        return {"xlsx": xlsx, "tfrecord": tfr, "warc": warc}

    for fmt in ("xlsx", "tfrecord", "warc"):
        for label, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
            df = frames(sf_dir)[fmt]
            df.count()  # warm scan
            timed_write(df, fmt, 16)  # warm codec path (untimed)
            t = min(timed_write(df, fmt, 16) for _ in range(2))
            print(f"{fmt:9s} {label:6s} parts=16  {t:6.2f}s")

    # xlsx rows-per-partition knee sweep at sf1 (50k rows, 4 cols)
    df = frames(sf1)["xlsx"]
    n = df.count()
    for parts in (64, 16, 4, 1):
        t = min(timed_write(df, "xlsx", parts) for _ in range(2))
        print(f"xlsx knee sf1 parts={parts:3d} rows/part={n // parts:6d} "
              f"{t:6.2f}s")


if __name__ == "__main__":
    main()
