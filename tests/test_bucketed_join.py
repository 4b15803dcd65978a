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
