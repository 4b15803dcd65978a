"""7-rep timing distributions for the r6→r7 driver-drift adjudication.

Round-6 VERDICT finding #1: the driver's BENCH_r06.json drifted +16% vs
BENCH_r05.json uniformly across ALL queries — including rows whose code
was byte-unchanged r5→r6 — and asked round 7 to adjudicate with the
7-rep distribution treatment (the r4 minhash playbook) on
`extract_pipeline`, `extract_write_parquet`, and one untouched TPC-H row,
tied explicitly to the driver artifact numbers.

Prints one JSON line per query: all 7 wall times (sorted), median, min,
max/min spread — so BENCH.md can place the r5 (17.38 s suite-era) and r6
(20.15 s suite-era) driver numbers inside or outside the measured band.

Usage: python tools/bench_7rep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(int(sf * 1_000_000), 1000)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from wine_label_ocr_spark.fixtures import pages_spark
    from wine_label_ocr_spark.plans.pipeline import extract_records
    from wine_label_ocr_spark.session import get_spark

    spark = get_spark(app="bench7rep", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(n_pages * 2600 // (cpus * 5), 1 << 20)))

    pq = os.path.join(tempfile.gettempdir(),
                      f"wlos_bench_pages_{n_pages}.parquet")
    if not os.path.exists(pq):
        pages_spark(spark, n_pages, partitions=cpus * 4).write.parquet(pq)
    pages = spark.read.parquet(pq).drop("text")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    sink = tempfile.mkdtemp(prefix="wlos_7rep_")
    jobs = {
        "extract_pipeline": lambda: force(extract_records(pages)),
        "extract_write_parquet": lambda: (
            extract_records(pages).drop("blob_data")
            .write.mode("overwrite").parquet(f"{sink}/records")),
        "lineitem_agg": lambda: force(qs["lineitem_agg"](spark, sf_dir)),
    }

    # same warm-up discipline as bench.py: JIT/codegen/python workers on
    # the real plan shape before any timed rep
    force(extract_records(pages.limit(2000)))

    for name, fn in jobs.items():
        fn()  # untimed warm-up for this exact plan
        runs = []
        for _ in range(7):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        runs.sort()
        print(json.dumps({
            "query": name,
            "reps": runs,
            "median": runs[3],
            "mean": round(statistics.fmean(runs), 3),
            "spread_max_over_min": round(runs[-1] / runs[0], 2),
            "sf": sf, "cpus": cpus,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
