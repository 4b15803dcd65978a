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


def test_host_profile_salted_plan_and_values(spark):
    """The curation host rollup (r3 VERDICT #9): (a) plan pin — TWO
    aggregation exchanges, the first keyed on (host, salt) so a hot host
    spreads over 16 reducers, the second merging |hosts|x16 partials;
    (b) values bit-identical to the direct groupBy."""
    from wine_label_ocr_spark.operators.textops import host_of, token_count
    from wine_label_ocr_spark.plans.curate import host_profile
    from wine_label_ocr_spark.plans.pipeline import extract_records

    pages = pages_spark(spark, 300, partitions=4)
    rec = extract_records(pages).cache()
    prof = host_profile(rec)

    plan = prof._jdf.queryExecution().executedPlan().toString()
    import re
    assert plan.count("Exchange hashpartitioning") == 2
    # phase 1 shuffles on (host, salt) — the hot-host spreader
    assert re.search(r"hashpartitioning\(_h#\d+, _salt", plan)
    # phase 2 merges partials keyed on host alone
    assert re.search(r"hashpartitioning\(_key#\d+,", plan)

    direct = (rec.groupBy(host_of(F.col("url")).alias("host"))
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum(F.length("text").cast("bigint")).alias("total_chars"),
                   F.sum(token_count(F.col("text")).cast("bigint")).alias("total_tokens")))
    got = {r["host"]: r for r in prof.collect()}
    want = {r["host"]: r for r in direct.collect()}
    assert set(got) == set(want)
    for h in want:
        assert (got[h]["n_docs"], got[h]["total_chars"], got[h]["total_tokens"]) == \
               (want[h]["n_docs"], want[h]["total_chars"], want[h]["total_tokens"])
    rec.unpersist()
