"""Noop-sink decomposition of the flagship extract pipeline (guide §1.4).

Times, on the cached bench pages parquet: scan only, scan→segment
(the Arrow kernel), +extract_fields (native stage 2), full records, and
the parquet write — so the wall clock can be attributed per stage.

Usage: python tools/bench_extract_parts.py [n_pages] [cpus]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wine_label_ocr_spark.operators.extraction import extract_fields, to_records
from wine_label_ocr_spark.operators.segmentation import segment
from wine_label_ocr_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app="extract_parts", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(n * 2600 // (cpus * 5), 1 << 20)))
    pq = os.path.join(tempfile.gettempdir(), f"wlos_bench_pages_{n}.parquet")
    pages = spark.read.parquet(pq).drop("text")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, reps=3):
        fn()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(f"{name:28s} {runs[len(runs)//2]:7.3f}  (min {runs[0]:.3f})")

    spark.sparkContext.setJobDescription("scan only")
    timed("scan_only", lambda: force(pages))
    spark.sparkContext.setJobDescription("scan+segment")
    timed("segment", lambda: force(segment(pages)))
    spark.sparkContext.setJobDescription("segment minus spans")
    timed("segment_drop_spans", lambda: force(segment(pages).drop("spans")))
    spark.sparkContext.setJobDescription("+fields")
    timed("fields", lambda: force(extract_fields(segment(pages))))
    spark.sparkContext.setJobDescription("records")
    timed("records", lambda: force(to_records(extract_fields(segment(pages)))))
    with tempfile.TemporaryDirectory() as tmp:
        spark.sparkContext.setJobDescription("write")
        timed("write_parquet", lambda: (
            to_records(extract_fields(segment(pages))).drop("blob_data")
            .write.mode("overwrite").parquet(f"{tmp}/r")), reps=2)
    spark.stop()


if __name__ == "__main__":
    main()
