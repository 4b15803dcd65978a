"""Scaling-efficiency evidence for the north rule (BASELINE.json).

Runs the SAME extraction job on the SAME input at two parallelism levels
(local[8] and local[32] — the sandbox stand-in for N- and 4N-executor
clusters) in separate JVMs, and reports throughput at both plus scaling
efficiency = (T8/T32)/4. Results go into BENCH.md.

Usage: python tools/bench_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

JOB = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from wine_label_ocr_spark.session import get_spark
from wine_label_ocr_spark.fixtures import pages_spark
from wine_label_ocr_spark.plans.pipeline import extract_records

cores, n = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app=f"scale{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
def force(df):
    df.write.format("noop").mode("overwrite").save()
# warm-up (JVM + python workers), excluded
force(extract_records(pages_spark(spark, 512, partitions=cores)))
t0 = time.perf_counter()
# fixed partition count for both runs: same input, same plan, same splits
force(extract_records(pages_spark(spark, n, partitions=128)))
dt = time.perf_counter() - t0
print("SCALERESULT " + json.dumps({"cores": cores, "sec": round(dt, 3),
                                   "docs_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", JOB, str(cores), str(n)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "16g"})
    for line in out.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):])
    raise RuntimeError(f"no result for cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    r8 = run(8, n)
    r32 = run(32, n)
    eff = (r8["sec"] / r32["sec"]) / 4.0
    print(json.dumps({"n_pages": n, "local8": r8, "local32": r32,
                      "speedup_8_to_32": round(r8["sec"] / r32["sec"], 3),
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
