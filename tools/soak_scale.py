"""Round-6 scale soaks (r5 VERDICT #9).

Two parts, each printing one JSON line:

* ``capstone N``  — N synthetic pages → WARC-gz shards → full
  ``curate_crawl`` (read → extract → gates → exact dedup → MinHash-LSH
  near-dup → CC keep-one → WET gz export). The r5 soak ran 1M; r6 runs
  3M (sf3) to push the LSH shuffle + gzip write one notch.
* ``ivfadc N``    — N deterministic 64-dim embeddings → IVFADC index
  (coarse cells × PQ codes) written ``partitionBy("cell")`` → top-k
  query over ONLY the probed cells, with FILE-LEVEL prune evidence
  (files read vs total; expected ratio ≈ nprobe/n_cells).

Usage:
    python tools/soak_scale.py capstone 3000000
    python tools/soak_scale.py ivfadc 1000000
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def synth_embeddings(spark, n: int, dim: int = 64):
    """Deterministic embeddings as pure column algebra (no RNG, no
    Python): component j of row i = fractional part of sin-free integer
    hashing, centered. Clustered enough for IVF to be non-trivial: a
    per-row cluster offset (i % 32) shifts the first 8 dims."""
    from pyspark.sql import functions as F
    i = F.col("id")
    comps = [
        ((F.xxhash64(i, F.lit(j)) % 1000) / 500.0 - 1.0
         + F.when(F.lit(j) < 8, ((i % 32) / 8.0) - 2.0).otherwise(F.lit(0.0)))
        .cast("double")
        for j in range(dim)]
    return spark.range(n).select(
        i.alias("vec_id"), F.array(*comps).alias("embedding"))


def run_capstone(n_pages: int) -> dict:
    from wine_label_ocr_spark.fixtures import pages_spark
    from wine_label_ocr_spark.plans.curate import curate_crawl
    from wine_label_ocr_spark.session import get_spark
    from wine_label_ocr_spark.sources.warc import write_warc_shards

    import os
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark(app="soak_capstone", master="local[32]",
                      shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="wlos_soak_")
    raw, out = os.path.join(base, "raw"), os.path.join(base, "wet")
    try:
        t0 = time.time()
        pages = pages_spark(spark, n_pages, partitions=192).withColumn(
            "html", __import__("pyspark.sql.functions",
                               fromlist=["encode"]).encode("html", "utf-8"))
        write_warc_shards(pages, raw, n_shards=192, compress=True).collect()
        t_ingest = time.time() - t0
        t1 = time.time()
        manifest = curate_crawl(spark, os.path.join(raw, "*.warc.gz"), out,
                                n_shards=192)
        t_curate = time.time() - t1
        n_rec = sum(m["n_records"] for m in manifest)
        n_bytes = sum(m["n_bytes"] for m in manifest)
        return {"soak": "capstone", "n_pages": n_pages,
                "ingest_sec": round(t_ingest, 1),
                "curate_sec": round(t_curate, 1),
                "docs_per_sec": round(n_pages / t_curate, 1),
                "curated_records": n_rec, "wet_shards": len(manifest),
                "wet_mb": round(n_bytes / 1e6, 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def run_ivfadc(n_vecs: int) -> dict:
    from pyspark.sql import functions as F

    from wine_label_ocr_spark.operators.ann import (
        ivfadc_index, ivfadc_topk, pq_fixed_codebooks)
    from wine_label_ocr_spark.session import get_spark

    n_cells, n_probes, m, ksub, dim = 32, 4, 8, 16, 64
    spark = get_spark(app="soak_ivfadc", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="wlos_ivfadc_")
    path = os.path.join(base, "index")
    try:
        emb = synth_embeddings(spark, n_vecs, dim)
        cents = pq_fixed_codebooks(1, n_cells, dim, seed=7)[0]
        books = pq_fixed_codebooks(m, ksub, dim)
        t0 = time.time()
        idx = ivfadc_index(emb, cents, books)
        idx.write.mode("overwrite").partitionBy("cell").parquet(path)
        t_build = time.time() - t0

        q = emb.filter(F.col("vec_id") % (n_vecs // 50) == 0) \
               .select(F.col("vec_id").alias("q_id"), "embedding")
        # probe cells resolve driver-side (tiny q×cells math) and become
        # literal partition predicates — the file-level prune
        import numpy as np
        C = np.array(cents)
        qrows = q.collect()
        probe_cells = sorted({
            int(c)
            for r in qrows
            for c in np.argsort(((np.array(r["embedding"]) - C) ** 2)
                                .sum(1))[:n_probes]})
        pruned = spark.read.parquet(path) \
            .filter(F.col("cell").isin(probe_cells))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        total_files = len(glob.glob(os.path.join(path, "cell=*/*.parquet")))
        read_files = sum(
            len(glob.glob(os.path.join(path, f"cell={c}", "*.parquet")))
            for c in probe_cells)
        t1 = time.time()
        topk = ivfadc_topk(q, pruned, cents, books, k=10, n_probes=n_probes)
        n_out = topk.count()
        t_query = time.time() - t1
        return {"soak": "ivfadc", "n_vecs": n_vecs, "n_cells": n_cells,
                "n_probes": n_probes, "m": m, "ksub": ksub,
                "build_sec": round(t_build, 1),
                "query_sec": round(t_query, 1),
                "n_queries": len(qrows), "topk_rows": n_out,
                "files_total": total_files, "files_read": read_files,
                "prune_ratio": round(read_files / max(total_files, 1), 3),
                "probed_cells": len(probe_cells),
                "expected_ratio_ub": round(
                    min(len(qrows) * n_probes, n_cells) / n_cells, 3)}
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    which = sys.argv[1]
    n = int(sys.argv[2])
    out = run_capstone(n) if which == "capstone" else run_ivfadc(n)
    print("SOAKRESULT " + json.dumps(out))
