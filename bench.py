"""Round benchmark: headline queries on $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {name: sec},
"sf": ..., "docs_per_sec": ..., "n_pages": ..., "cpus": ...}``.

The flagship measurement is the production-shaped extraction pipeline:
a parquet scan of N = sf·1e6 synthetic Common-Crawl-style pages (written
once to a cached local dir, generation excluded from timing) → stage-1
segmentation → stage-2 field extraction → noop sink (forces full
materialization, no driver collect). Scaling-efficiency evidence
(local[8] vs local[32], CPU-pinned) lives in tools/bench_scaling.py and
BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    n_pages = max(int(sf * 1_000_000), 1000)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from wine_label_ocr_spark.fixtures import pages_spark
    from wine_label_ocr_spark.plans.pipeline import extract_records
    from wine_label_ocr_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # ~5 tasks/core on this input (~2.6KB/page): measured-best pipelining
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(n_pages * 2600 // (cpus * 5), 1 << 20)))

    pq = os.path.join(tempfile.gettempdir(), f"wlos_bench_pages_{n_pages}.parquet")
    if not os.path.exists(pq):
        pages_spark(spark, n_pages, partitions=cpus * 4).write.parquet(pq)
    pages = spark.read.parquet(pq).drop("text")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}

    def timed(name, fn, reps: int = 1):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # warm the JVM (codegen/JIT) + python workers on the real plan shape
    force(extract_records(pages.limit(2000)))

    timed("extract_pipeline", lambda: force(extract_records(pages)), reps=2)

    with tempfile.TemporaryDirectory() as tmp:
        timed("extract_write_parquet", lambda: (
            extract_records(pages)
            .drop("blob_data")
            .write.mode("overwrite").parquet(f"{tmp}/records")))

    # best-of-2 per query: the first execution pays codegen/JIT compile and
    # is the noisiest — one-shot numbers on this host vary 2-3×
    qs = entrymod.queries()
    for name in ("lineitem_agg", "orders_by_segment", "window_spread_5s",
                 "running_peak", "fuzzy_blocked_join", "exact_dedup",
                 "cosine_topk", "ema_final", "sessionize", "quality_scores",
                 "content_fingerprint"):
        timed(name, lambda n=name: force(qs[n](spark, sf_dir)), reps=2)

    # dedup family: bench the PRODUCTION hash flavor (xxhash64), not the
    # md5 oracle_safe flavor the correctness gate needs for DuckDB parity
    # (r1 VERDICT #9); repartition the single-split scan so the heavy
    # signature maps use every core, as a many-split scan would at scale.
    from pyspark.sql import functions as F
    from wine_label_ocr_spark.operators.dedupe import minhash_lsh_pairs, simhash64
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cpus * 2))
    timed("minhash_lsh", lambda: force(
        minhash_lsh_pairs(docs, n_perm=16, n_bands=4, min_jaccard=0.4)), reps=2)
    timed("simhash_fingerprints", lambda: force(
        docs.select("doc_id", simhash64(F.col("text")).alias("simhash"))), reps=2)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["extract_pipeline"], 1)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_pages": n_pages,
        "docs_per_sec": docs_per_sec,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
