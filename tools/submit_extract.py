"""Canonical spark-submit entrypoint for the extraction pipeline.

Usage (the north-rule launch shape):

    zip -r wlos.zip wine_label_ocr_spark
    spark-submit --py-files wlos.zip tools/submit_extract.py \
        --input  /path/to/pages_parquet_or_SYNTH:N \
        --output /path/to/records_table \
        --buckets 64 --run-id run1

Reads a pages table ``(url, warc_ts, html, text?, lang)`` from parquet, a
WARC crawl directly (``--input '/crawl/*.warc.gz'`` — any glob ending in
.warc or .warc.gz, plain or per-record-gzip shards), or synthesizes N
deterministic pages with ``SYNTH:N``; runs the two-stage extraction, and
writes the records table through the resumable bucket-checkpointed path
(re-running after a kill resumes at the first uncommitted bucket).
Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet dir, a *.warc/*.warc.gz glob, "
                         "or SYNTH:<n_pages>")
    ap.add_argument("--output", required=True, help="records table root")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from wine_label_ocr_spark.fixtures import pages_spark
    from wine_label_ocr_spark.plans.pipeline import extract_records
    from wine_label_ocr_spark.plans.resumable import ResumableRun
    from wine_label_ocr_spark.session import get_spark

    spark = get_spark(app="extract_submit", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.input.startswith("SYNTH:"):
        pages = pages_spark(spark, int(args.input.split(":", 1)[1]))
    elif args.input.endswith((".warc", ".warc.gz")):
        from wine_label_ocr_spark.sources.warc import read_warc
        pages = read_warc(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)

    rr = ResumableRun(args.output, run_id=args.run_id, n_buckets=args.buckets)
    t0 = time.time()
    res = rr.run(spark, pages, extract_records)
    wall = time.time() - t0
    rec = rr.records.read(spark)
    n = rec.count() if rec is not None else 0
    print(json.dumps({**res, "n_records": n, "wall_sec": round(wall, 2),
                      "docs_per_sec": round(n / max(wall, 1e-9), 1)}))
    spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()
