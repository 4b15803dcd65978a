"""Local stand-in for the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin
on the same parquet tables (default sf0.01), compares row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values canonicalized). Usage: ``python tools/check_oracle.py [sf_dir]``.
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import datetime

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from wine_label_ocr_spark.session import get_spark

    spark = get_spark(app="check_oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oq:
            print(f"ok?  {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oq[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            failures += 1
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        sh = value_hash(scols, [[r[c] for c in scols] for r in srows])
        dh = value_hash(dcols, drows)
        ok_h = sh == dh
        status = "PASS" if (ok_n and ok_c and ok_h) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_c} hash_ok={ok_h}")
        if not ok_h and ok_c and srows and drows:
            names = sorted(scols)
            sset = sorted("|".join(canon(r[c]) for c in names) for r in srows)
            dmap = [dcols.index(c) for c in names]
            dset = sorted("|".join(canon(row[i]) for i in dmap) for row in drows)
            d_as_set = set(dset)
            s_as_set = set(sset)
            print("   spark-only:", [x[:160] for x in sset if x not in d_as_set][:3])
            print("   duck-only :", [x[:160] for x in dset if x not in s_as_set][:3])
    print("failures:", failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
