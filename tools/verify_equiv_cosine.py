"""Prove the numpy cosine_topk path is bit-identical to the legacy
expression plan (same rows, binary-equal doubles) on real SF data."""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W, functions as F

from wine_label_ocr_spark.operators.ann import cosine, cosine_topk
from wine_label_ocr_spark.session import get_spark


def legacy_topk(q, c, k):
    scored = (c.join(F.broadcast(q))
              .select("q_id", "c_id",
                      cosine(F.col("_qv"), F.col("_cv")).alias("cosine")))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", F.round("cosine", 6).alias("cosine"),
                    "rank"))


def canon_rows(df):
    rows = df.collect()
    out = []
    for r in rows:
        cos = r["cosine"]
        cos_bits = None if cos is None else struct.pack("<d", cos).hex()
        out.append((r["q_id"], r["c_id"], cos_bits, r["rank"]))
    return sorted(out)


def main():
    spark = get_spark(app="verify_cosine", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01",
                                   "/root/testdata/sf0.1",
                                   "/root/testdata/sf1.0"]:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rounded = e.select(
            "vec_id",
            F.transform("embedding",
                        lambda x: F.round(x.cast("double"), 3)).alias("embedding"))
        qdf = (rounded.filter(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
        new = canon_rows(cosine_topk(qdf, rounded, k=5))
        q = qdf.select(F.col("q_id"), F.col("embedding").alias("_qv"))
        c = rounded.select(F.col("vec_id").alias("c_id"),
                           F.col("embedding").alias("_cv"))
        old = canon_rows(legacy_topk(q, c, 5))
        same = new == old
        print(f"{sf_dir}: rows new={len(new)} old={len(old)} "
              f"bit_identical={same}")
        if not same:
            diffs = [(a, b) for a, b in zip(old, new) if a != b]
            print("  first diffs:", diffs[:5])
            sys.exit(1)
    print("ALL BIT-IDENTICAL")
    spark.stop()


if __name__ == "__main__":
    main()
