"""Bounded experiment (r5 VERDICT #8): can the stage-1 lexer's hot 80%
— block-tag splitting + text/link-density features — run as native JVM
column algebra, and at what speed vs the Python ``oracle.extract``
kernel?

This is a COST experiment, not a replacement: the JVM flavor
approximates the lexer (regex block split, tag strip, 5-entity
unescape, D2-style 0.4/0.3/0.3 scoring) but does NOT implement the
skip/boiler depth stacks, charset detection, or the fallback cascade,
so it cannot be byte-identical — byte identity is the frozen contract
(golden corpus + oracle twins). The question is only: if the stack
machine WERE re-expressed JVM-side, what throughput ceiling does Spark's
regex/array algebra offer on the same documents?

Method (memory: spark-local-bench-gotchas — median of reps, same input
shape both paths, warmup rep discarded): N synthetic pages
(fixtures.pages_spark, the flagship corpus), both paths reduced with a
count-ish aggregate so neither pays collect; wall includes the whole
job. Usage: python tools/bench_lexer_jvm.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def jvm_block_stats(pages):
    """The JVM approximation: per page → (n_blocks, kept_blocks,
    kept_chars) via pure column algebra (one split + one transform +
    one filter — zero Python)."""
    from pyspark.sql import functions as F

    from wine_label_ocr_spark.functions import let

    html = F.col("html").cast("string")
    cleaned = F.regexp_replace(
        html, r"(?is)<(script|style|head)[^>]*>.*?</\1>", " ")
    blocks = F.split(
        cleaned,
        r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|section|article|"
        r"footer|header|nav|aside|blockquote|pre|br)\b[^>]*>")

    def unescape(c):
        c = F.regexp_replace(c, "&lt;", "<")
        c = F.regexp_replace(c, "&gt;", ">")
        c = F.regexp_replace(c, "&quot;", '"')
        c = F.regexp_replace(c, "&#39;", "'")
        return F.regexp_replace(c, "&amp;", "&")

    def block_stat(b):
        def mk(vis):
            n = F.length(vis)
            link_raw = F.array_join(
                F.regexp_extract_all(b, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), 1), " ")
            link_vis = F.trim(F.regexp_replace(
                F.regexp_replace(link_raw, "<[^>]*>", " "), r"\s+", " "))
            ld = F.when(n > 0, F.least(
                F.length(link_vis) / n, F.lit(1.0))).otherwise(F.lit(0.0))
            td = F.least(n / F.lit(200.0), F.lit(1.0))
            score = 0.4 * td + 0.3 * (1.0 - ld) + 0.3 * td
            return F.struct(n.alias("n"), score.alias("score"))

        vis = F.trim(F.regexp_replace(
            F.regexp_replace(unescape(b), "<[^>]*>", " "), r"\s+", " "))
        return let(vis, mk)

    stats = F.filter(F.transform(blocks, block_stat), lambda s: s["n"] > 0)

    def agg(st):
        kept = F.filter(st, lambda s: s["score"] >= 0.3)
        return F.struct(
            F.size(st).alias("n_blocks"),
            F.size(kept).alias("kept_blocks"),
            F.aggregate(kept, F.lit(0),
                        lambda acc, s: acc + s["n"]).alias("kept_chars"))

    return pages.select("url", let(stats, agg).alias("s")) \
        .select("url", "s.n_blocks", "s.kept_blocks", "s.kept_chars")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from wine_label_ocr_spark.fixtures import pages_spark
    from wine_label_ocr_spark.operators.segmentation import segment
    from wine_label_ocr_spark.session import get_spark

    spark = get_spark(app="bench_lexer", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = pages_spark(spark, n_pages, partitions=64).cache()
    pages.count()  # materialize the input once, outside both timers

    def run(df):
        return df.agg(F.count(F.lit(1)), F.sum(F.length("url"))).collect()

    results = {}
    for name, build in [
            ("python_extract", lambda: segment(pages)
             .select("url", "n_blocks", "kept_blocks", "raw_chars")),
            ("jvm_block_stats", lambda: jvm_block_stats(pages))]:
        walls = []
        for i in range(reps):
            t0 = time.time()
            run(build())
            walls.append(time.time() - t0)
        warmup, walls = walls[0], walls[1:]  # JIT/codegen rep separate
        walls.sort()
        med = walls[len(walls) // 2]
        results[name] = {"median_sec": round(med, 3),
                         "docs_per_sec": round(n_pages / med, 1),
                         "warmup_sec": round(warmup, 3),
                         "reps": [round(w, 3) for w in walls]}
    results["jvm_over_python"] = round(
        results["python_extract"]["median_sec"]
        / results["jvm_block_stats"]["median_sec"], 2)
    results["n_pages"] = n_pages
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
