"""Bucketed co-located join — the shuffle-free join layout for 100 TB.

SURVEY.md §4: "repartition/bucketing for co-located joins". Writing both
sides bucketed on the join key lets Catalyst plan a sort-merge join with
NO Exchange on either side — at petabyte scale this is the difference
between a join that reshuffles everything and one that streams.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    # warehouse dir is set to a tmp dir by the session fixture (static conf)
    pages = spark.range(0, 2000).select(
        F.concat(F.lit("https://h/p/"), F.col("id")).alias("url"),
        (F.col("id") % 97).alias("feature"))
    meta = spark.range(0, 2000, 2).select(
        F.concat(F.lit("https://h/p/"), F.col("id")).alias("url"),
        (F.col("id") % 13).alias("tag"))
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS meta_b")
    (pages.write.bucketBy(8, "url").sortBy("url")
     .mode("overwrite").saveAsTable("pages_b"))
    (meta.write.bucketBy(8, "url").sortBy("url")
     .mode("overwrite").saveAsTable("meta_b"))

    # disable auto-broadcast so the join planner must choose sort-merge —
    # the point is that bucketing removes the shuffle, not the broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("pages_b").join(spark.table("meta_b"), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan   # co-located: zero shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


class TestBucketedSeenStore:
    """Hash-bucketed seen-URL store (r8 VERDICT #4): the membership
    probe never scans or exchanges the store — candidates shuffle once
    on the bucket key and each task opens only its own bucket's files."""

    def _urls(self, spark, ids):
        return spark.createDataFrame(
            [(f"https://h{i % 7}.com/p/{i}",) for i in ids], "url string")

    def test_probe_matches_anti_join(self, spark, tmp_path):
        from wine_label_ocr_spark.plans.crawl import (SeenUrlStore,
                                                      seen_url_fps)
        store = SeenUrlStore(str(tmp_path / "s"), n_buckets=16)
        store.record_fetched(spark, self._urls(spark, range(0, 600, 2)))
        store.record_fetched(spark, self._urls(spark, range(0, 900, 3)))
        cand = seen_url_fps(self._urls(spark, range(0, 1000)))
        got = sorted(r["fp"] for r in store.probe_unseen(cand).collect())
        plain = store.read(spark)
        want = sorted(r["fp"] for r in
                      cand.join(plain, "fp", "left_anti").collect())
        assert got == want and 0 < len(got) < 1000

    def test_probe_plan_never_touches_store(self, spark, tmp_path):
        from wine_label_ocr_spark.plans.crawl import (SeenUrlStore,
                                                      seen_url_fps)
        root = str(tmp_path / "s")
        store = SeenUrlStore(root, n_buckets=8)
        store.record_fetched(spark, self._urls(spark, range(300)))
        cand = seen_url_fps(self._urls(spark, range(200, 500)))
        probe = store.probe_unseen(cand)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # the store path appears in NO scan; no broadcast either; the
        # probe itself adds exactly one exchange — the candidates'
        # bucket-key shuffle (the other Exchange in the plan is
        # seen_url_fps' distinct on the CANDIDATE side, present with or
        # without the probe)
        assert root not in plan
        assert "BroadcastExchange" not in plan
        assert "hashpartitioning(_bucket" in plan
        base_plan = cand._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == base_plan.count("Exchange") + 1

    def test_write_path_dedup_and_one_file_per_bucket(self, spark,
                                                      tmp_path):
        from wine_label_ocr_spark.plans.crawl import SeenUrlStore
        store = SeenUrlStore(str(tmp_path / "s"), n_buckets=8)
        store.record_fetched(spark, self._urls(spark, range(100)))
        n1 = len(store.table.current_files())
        # overlapping second batch: only the 100 new fps commit
        store.record_fetched(spark, self._urls(spark, range(50, 200)))
        snap = store.table._current_snapshot()
        assert store.read(spark).count() == 200
        assert n1 <= 8 and len(snap["new_files"]) <= 8
        # bucket= path segments present and consistent with pmod(fp, 8)
        by_bucket = store._files_by_bucket()
        assert set(by_bucket) <= set(range(8))
        for b, files in by_bucket.items():
            rows = spark.read.parquet(*files).collect()
            assert all(r["fp"] % 8 == b for r in rows)

    def test_bucketed_compaction_preserves_probe(self, spark, tmp_path):
        from wine_label_ocr_spark.plans.crawl import (SeenUrlStore,
                                                      seen_url_fps)
        store = SeenUrlStore(str(tmp_path / "s"), n_buckets=4)
        for lo in range(0, 500, 100):
            store.record_fetched(spark,
                                 self._urls(spark, range(lo, lo + 100)))
        before = store.read(spark).count()
        sid = store.maybe_compact(spark, max_files=4)
        assert sid is not None
        assert store.read(spark).count() == before
        # layout is still bucketed after compaction; probe still exact
        assert set(store._files_by_bucket()) <= set(range(4))
        cand = seen_url_fps(self._urls(spark, range(400, 700)))
        got = {r["fp"] for r in store.probe_unseen(cand).collect()}
        want = {r["fp"] for r in cand.join(store.read(spark), "fp",
                                           "left_anti").collect()}
        assert got == want

    def test_crawl_cycle_accepts_bucketed_store(self, spark, tmp_path):
        """crawl_cycle(seen_fps=<bucketed store>) schedules the same
        URLs as the default anti-join on the store's rows."""
        from wine_label_ocr_spark.plans.crawl import (SeenUrlStore,
                                                      crawl_cycle)
        pages = spark.createDataFrame(
            [("https://a.com/", '<a href="/x">x</a><a href="/y">y</a>'
              '<a href="https://b.com/z">z</a>')],
            "url string, html string")
        robots = spark.createDataFrame(
            [("a.com", "User-agent: *\nAllow: /"),
             ("b.com", "User-agent: *\nAllow: /")],
            "host string, robots_txt string")
        store = SeenUrlStore(str(tmp_path / "s"), n_buckets=8)
        store.record_fetched(
            spark, spark.createDataFrame([("https://a.com/y",)],
                                         "url string"))
        via_store = {r["url"] for r in
                     crawl_cycle(pages, robots, seen_fps=store).collect()}
        via_df = {r["url"] for r in
                  crawl_cycle(pages, robots,
                              seen_fps=store.read(spark)).collect()}
        assert via_store == via_df == {"https://a.com/x",
                                       "https://b.com/z"}
