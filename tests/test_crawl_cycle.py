"""Tests for the crawl-cycle capstone (plans/crawl.py) and its
streaming twin — the cross-operator contracts the per-operator gates
cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

from wine_label_ocr_spark.plans.crawl import (
    crawl_cycle, crawl_cycle_funnel, seen_url_fps)

PAGES = [
    # src url, html
    ("https://a.com/dir/p1",
     '<a href="https://b.com/x/1">1</a>'
     '<a href="sub/../q.html">rel</a>'          # -> https://a.com/dir/q.html
     '<a href="https://b.com/x/1?utm_source=z">trk</a>'  # canon dup of x/1
     '<a href=/bare>u</a>'                      # -> https://a.com/bare
     '<a href="#f">frag</a>'),
    ("https://a.com/dir/p2",
     '<a href="https://b.com/priv/s">blocked</a>'
     '<a href="https://b.com/x/1">dup-across-pages</a>'),
    ("https://c.com/p",
     '<a href="https://seen.com/old">seen</a>'
     '<a href="https://c.com/new">n</a>'),
]

ROBOTS = [
    ("b.com", "User-agent: *\nDisallow: /priv/\nCrawl-delay: 2\n"),
]


def _inputs(spark):
    pages = spark.createDataFrame(PAGES, "url string, html string")
    robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    seen = seen_url_fps(
        spark.createDataFrame([("https://seen.com/old",)], "url string"))
    return pages, robots, seen


def test_crawl_cycle_composed_contracts(spark):
    pages, robots, seen = _inputs(spark)
    sched = crawl_cycle(pages, robots, seen).collect()
    rows = {r["url"]: r for r in sched}
    # canonicalization collapsed the tracking-param variant and the
    # cross-page duplicate of b.com/x/1 into ONE scheduled fetch
    assert sorted(rows) == ["https://a.com/bare", "https://a.com/dir/q.html",
                            "https://b.com/x/1", "https://c.com/new"]
    # robots: /priv/ disallowed on b.com; Crawl-delay: 2 -> 2000 ms on
    # the surviving b.com url; other hosts get the 1000 ms default
    assert rows["https://b.com/x/1"]["delay_ms"] == 2000
    assert rows["https://a.com/bare"]["delay_ms"] == 1000
    # seen store suppressed the previously-fetched url
    assert "https://seen.com/old" not in rows
    # per-host seq is 1-based and url-ordered
    a = sorted((r["seq"], r["url"]) for r in sched if r["host"] == "a.com")
    assert a == [(1, "https://a.com/bare"), (2, "https://a.com/dir/q.html")]
    assert all(r["fetch_offset_ms"] == (r["seq"] - 1) * r["delay_ms"]
               for r in sched)


def test_crawl_cycle_funnel_counts(spark):
    pages, robots, seen = _inputs(spark)
    got = {r["stage"]: r["n_urls"]
           for r in crawl_cycle_funnel(pages, robots, seen).collect()}
    # 5 + 2 + 2 extracted hrefs minus the fragment-only one
    assert got["outlinks"] == 8
    # distinct canonical: bare, dir/q.html, b.com/x/1, b.com/priv/s,
    # seen.com/old, c.com/new
    assert got["candidates"] == 6
    assert got["unseen"] == 5          # seen.com/old anti-joined away
    assert got["allowed"] == 4         # /priv/ disallowed
    assert got["scheduled"] == got["allowed"]  # scheduler drops nothing


def test_two_cycle_loop_seen_store_update(spark):
    """Cycle N's schedule, once fetched, must not reappear in cycle
    N+1 — the seen_url_fps union is the crawl-over-crawl loop."""
    pages, robots, seen = _inputs(spark)
    first = crawl_cycle(pages, robots, seen)
    fetched = first.select("url")
    seen2 = seen.unionByName(seen_url_fps(fetched)).distinct()
    again = crawl_cycle(pages, robots, seen2)
    assert again.count() == 0


def test_crawl_candidates_stream_equals_batch(spark, tmp_path):
    """Stream candidates + per-micro-batch scheduling (foreachBatch) ≡
    the batch crawl_cycle on the same pages: verdicts AND slots."""
    import glob
    import shutil

    from wine_label_ocr_spark.operators.frontier import schedule_frontier
    from wine_label_ocr_spark.operators.robots import robots_directives
    from wine_label_ocr_spark.streaming.extract_stream import (
        crawl_candidates_stream)

    pages, robots, seen = _inputs(spark)
    want = sorted(map(tuple, crawl_cycle(pages, robots, seen).collect()))

    src = tmp_path / "pages_src"
    src.mkdir()
    stage = str(tmp_path / "pages_stage")
    pages.coalesce(1).write.parquet(stage)
    shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                str(src / "a.parquet"))

    got = []

    def plan_batch(batch_df, _epoch):
        sched = schedule_frontier(
            batch_df.filter(F.col("allowed")).select("url").distinct(),
            robots_directives(robots), delay_col="crawl_delay_ms")
        got.extend(map(tuple, sched.collect()))

    st = spark.readStream.schema("url string, html string") \
        .parquet(str(src))
    q = (crawl_candidates_stream(st, robots, seen)
         .writeStream.foreachBatch(plan_batch)
         .option("checkpointLocation", str(tmp_path / "cc_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(got) == want


def test_robots_map_flavor_equals_groupby_flavor(spark):
    """The map-flavored verdict (array_max over struct(rule_len,
    allow)) must agree with the certified groupBy flavor on every
    wildcard/anchor/specificity shape."""
    from wine_label_ocr_spark.operators.robots import (
        parse_robots_rules, robots_allowed, robots_allowed_map,
        robots_rules_by_host)
    robots = spark.createDataFrame(
        [("h0.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
         ("h1.com:8080", "User-agent: *\nDisallow: /\n"),
         ("h5.com", "User-agent: *\nDisallow: /*.pdf$\n"
                    "Allow: /docs/keep*\nDisallow: /docs/\n"),
         ("h6.com", "User-agent: *\nDisallow: /a/*/secret\n"
                    "Disallow: /public/x$\nDisallow: /priv$\n")],
        "host string, robots_txt string")
    rules = parse_robots_rules(robots)
    urls = spark.createDataFrame(
        [(f"https://h{h}.com{p}",) for h in range(8)
         for p in ["/public/x", "/public/x/more", "/private/x",
                   "/private/ok/y", "/docs/keep/a.pdf", "/docs/old/a.pdf",
                   "/a/b/secret", "/priv", "", "?q=1"]], "url string")
    a = {r["url"]: r["allowed"] for r in robots_allowed(urls, rules).collect()}
    b = {r["url"]: r["allowed"]
         for r in robots_allowed_map(urls, robots_rules_by_host(rules))
         .collect()}
    assert a == b
