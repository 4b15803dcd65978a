"""Salted-aggregation correctness: two-phase ≡ direct groupBy on skewed hosts."""

from __future__ import annotations

from pyspark.sql import functions as F

from wine_label_ocr_spark.fixtures import HOT_HOSTS, pages_spark
from wine_label_ocr_spark.plans.skew import host_col, salt_col, salted_agg, top_hosts


def test_fixture_is_actually_skewed(spark):
    pages = pages_spark(spark, 600, partitions=4)
    counts = (pages.groupBy(host_col(F.col("url")).alias("h"))
              .count().collect())
    hot = sum(r["count"] for r in counts if r["h"] in HOT_HOSTS)
    assert 0.2 <= hot / 600 <= 0.4  # ~30% on 3 hot hosts (FIXTURES.md §1)


def test_salt_is_deterministic_and_spreads(spark):
    pages = pages_spark(spark, 400, partitions=4).cache()
    a = pages.select(salt_col(F.col("url")).alias("s")).collect()
    b = pages.select(salt_col(F.col("url")).alias("s")).collect()
    assert a == b
    n_distinct = pages.select(salt_col(F.col("url")).alias("s")).distinct().count()
    assert n_distinct == 16


def test_salted_agg_equals_direct(spark):
    pages = pages_spark(spark, 500, partitions=4).cache()
    withhost = pages.withColumn("_host", host_col(F.col("url")))
    direct = {r["_host"]: (r["n"], r["b"]) for r in
              withhost.groupBy("_host")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.octet_length("html").cast("bigint")).alias("b"))
              .collect()}
    salted = {r["_key"]: (r["n_pages"], r["total_bytes"]) for r in
              salted_agg(withhost, "_host",
                         {"n_pages": ("count", F.lit(1)),
                          "total_bytes": ("sum", F.octet_length("html").cast("bigint"))})
              .collect()}
    assert direct == salted


def test_top_hosts(spark):
    pages = pages_spark(spark, 500, partitions=4)
    rows = top_hosts(pages, n=3).collect()
    assert len(rows) == 3
    assert {r["host"] for r in rows} <= set(HOT_HOSTS)
    assert rows[0]["n_pages"] >= rows[1]["n_pages"] >= rows[2]["n_pages"]
