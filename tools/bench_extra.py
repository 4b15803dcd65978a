"""Per-query isolation bench (guide §1.4) — NOT the frozen driver bench.

Times individual headline queries with the noop sink on an arbitrary SF
dir, with configurable reps, and can dump ``explain("formatted")`` plans.

Usage::

    python tools/bench_extra.py [--sf DIR] [--reps N] [--explain OUTDIR] \
        [query ...]

Queries: any ``__spark_entry__.queries()`` name, plus the bench-only
names ``extract_pipeline``, ``extract_write_parquet``, ``minhash_lsh_xx``
(production xxhash64 flavor), ``simhash_xx``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain", default=None,
                    help="directory to write <name>.txt formatted plans")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from wine_label_ocr_spark.operators.dedupe import minhash_lsh_pairs, simhash64
    from wine_label_ocr_spark.session import get_spark

    sf_dir = args.sf
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(int(sf * 1_000_000), 1000)

    spark = get_spark(app="bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(n_pages * 2600 // (args.cpus * 5), 1 << 20)))

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    builders = {name: (lambda n=name: qs[n](spark, sf_dir)) for name in qs}

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(args.cpus * 2))
    builders["minhash_lsh_xx"] = lambda: minhash_lsh_pairs(
        docs, n_perm=16, n_bands=4, min_jaccard=0.4)
    builders["simhash_xx"] = lambda: docs.select(
        "doc_id", simhash64(F.col("text")).alias("simhash"))

    def pages_df():
        pq = os.path.join(tempfile.gettempdir(),
                          f"wlos_bench_pages_{n_pages}.parquet")
        if not os.path.exists(pq):
            from wine_label_ocr_spark.fixtures import pages_spark
            pages_spark(spark, n_pages,
                        partitions=args.cpus * 4).write.parquet(pq)
        return spark.read.parquet(pq).drop("text")

    def extract_df():
        from wine_label_ocr_spark.plans.pipeline import extract_records
        return extract_records(pages_df())

    builders["extract_pipeline"] = extract_df

    names = args.queries or ["extract_pipeline", "fuzzy_blocked_join",
                             "exact_dedup", "cosine_topk", "ema_final",
                             "quality_scores", "content_fingerprint",
                             "minhash_lsh_xx", "simhash_xx"]

    timings: dict[str, float] = {}
    bands: dict[str, list[float]] = {}
    for name in names:
        build = builders[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(build()._sc._jvm.PythonSQLUtils.explainString(
                    build()._jdf.queryExecution(), "formatted"))
        if name == "extract_write_parquet" or args.reps <= 0:
            continue
        force(build())  # warm-up
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            force(build())
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[(len(runs) - 1) // 2], 3)
        bands[name] = [round(runs[0], 3), timings[name], round(runs[-1], 3)]
        print(f"  {name}: {timings[name]} {bands[name]}", flush=True)

    print(json.dumps({"sf": sf, "reps": args.reps, "queries": timings,
                      "band": bands}))
    spark.stop()


if __name__ == "__main__":
    main()
