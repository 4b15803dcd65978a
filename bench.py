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
    spreads: dict[str, float] = {}
    bands: dict[str, list[float]] = {}

    def timed(name, fn, reps: int = 7):
        # one untimed warm-up (codegen/JIT/python-worker spin-up), then
        # median-of-`reps` (7 by default — r7 VERDICT #10: the artifact
        # carries the full [min, median, max] band per query, so a
        # loaded-host run is visible IN the artifact instead of needing
        # a post-hoc adjudication section); writes stay at 3 reps —
        # page-cache pressure degrades writes monotonically across reps
        # (4.3→9.7 s over 7 at sf0.1), which would bias a 7-rep median
        fn()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        # lower median (for reps=2 that's the min of the two)
        timings[name] = round(runs[(len(runs) - 1) // 2], 3)
        spreads[name] = round(runs[-1] / max(runs[0], 1e-9), 2)
        bands[name] = [round(runs[0], 3), timings[name], round(runs[-1], 3)]

    # warm the JVM (codegen/JIT) + python workers on the real plan shape
    force(extract_records(pages.limit(2000)))

    timed("extract_pipeline", lambda: force(extract_records(pages)))

    with tempfile.TemporaryDirectory() as tmp:
        timed("extract_write_parquet", lambda: (
            extract_records(pages)
            .drop("blob_data")
            .write.mode("overwrite").parquet(f"{tmp}/records")), reps=3)

    qs = entrymod.queries()
    for name in ("lineitem_agg", "orders_by_segment", "window_spread_5s",
                 "running_peak", "fuzzy_blocked_join", "exact_dedup",
                 "cosine_topk", "ema_final", "sessionize", "quality_scores",
                 "content_fingerprint"):
        timed(name, lambda n=name: force(qs[n](spark, sf_dir)))

    # dedup family: bench the PRODUCTION hash flavor (xxhash64), not the
    # md5 oracle_safe flavor the correctness gate needs for DuckDB parity
    # (r1 VERDICT #9); repartition the single-split scan so the heavy
    # signature maps use every core, as a many-split scan would at scale.
    from pyspark.sql import functions as F
    from wine_label_ocr_spark.operators.dedupe import minhash_lsh_pairs, simhash64
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cpus * 2))
    timed("minhash_lsh", lambda: force(
        minhash_lsh_pairs(docs, n_perm=16, n_bands=4, min_jaccard=0.4)))
    timed("simhash_fingerprints", lambda: force(
        docs.select("doc_id", simhash64(F.col("text")).alias("simhash"))))

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_pages / timings["extract_pipeline"], 1)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread_max_over_min": spreads,
        "band_min_med_max": bands,
        "timing": "median of 7 after 1 untimed warm-up (write: median of 3)",
        "sf": sf,
        "n_pages": n_pages,
        "docs_per_sec": docs_per_sec,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
