"""Dump .explain('formatted') for every bench-timed query (r10 evidence).

Usage: python tools/dump_plans_r10.py <suffix>   # suffix: before|after
Writes plans/r10/<query>_<suffix>.txt
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from wine_label_ocr_spark.session import get_spark
from wine_label_ocr_spark.plans.pipeline import extract_records
from wine_label_ocr_spark.operators.dedupe import minhash_lsh_pairs, simhash64

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r10")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app="plans_r10", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

pages_pq = "/tmp/wlos_bench_pages_100000.parquet"
pages = spark.read.parquet(pages_pq).drop("text")

def dump(name, df):
    p = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(p, "w") as f:
        f.write(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print("wrote", p)

dump("extract_pipeline", extract_records(pages))
qs = entrymod.queries()
for name in ("lineitem_agg", "orders_by_segment", "window_spread_5s",
             "running_peak", "fuzzy_blocked_join", "exact_dedup",
             "cosine_topk", "ema_final", "sessionize", "quality_scores",
             "content_fingerprint"):
    dump(name, qs[name](spark, sf_dir))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
dump("minhash_lsh", minhash_lsh_pairs(docs, n_perm=16, n_bands=4, min_jaccard=0.4))
dump("simhash_fingerprints", docs.select("doc_id", simhash64(F.col("text")).alias("simhash")))
spark.stop()
