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


def test_crawl_cycle_broadcast_candidates_plan_and_equivalence(spark):
    """The incremental-crawl membership plan (broadcast_candidates=True)
    must schedule EXACTLY what the default anti-join schedules, and its
    plan must never shuffle the seen store: the store side reaches both
    membership joins as a scan feeding BroadcastHashJoins — zero
    fp-keyed Exchange (the default anti-join shuffles the whole store,
    measured ~store-size per cycle at 1M pages, BENCH.md r8)."""
    pages, robots, seen = _inputs(spark)
    # materialize the store as production has it (a parquet scan, not a
    # derivation carrying its own distinct-exchange)
    seen = spark.createDataFrame(seen.collect(), "fp bigint")
    base = sorted(r["url"] for r in crawl_cycle(pages, robots, seen).collect())
    bc = crawl_cycle(pages, robots, seen, broadcast_candidates=True)
    assert sorted(r["url"] for r in bc.collect()) == base
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(fp" not in plan
    assert "hashpartitioning(_fp" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


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


def test_crawl_funnel_one_pass_equals_branch_counts(spark):
    """The Observation one-pass form (r8 VERDICT #8) counts exactly what
    the five count branches count — same stage DAG, observed during ONE
    materialization instead of re-executed per stage."""
    from wine_label_ocr_spark.plans.crawl import run_crawl_funnel_one_pass
    pages, robots, seen = _inputs(spark)
    branches = {r["stage"]: r["n_urls"]
                for r in crawl_cycle_funnel(pages, robots, seen).collect()}
    one_pass = run_crawl_funnel_one_pass(pages, robots, seen)
    assert one_pass == branches


def test_crawl_funnel_one_pass_writes_schedule(spark, tmp_path):
    from wine_label_ocr_spark.plans.crawl import run_crawl_funnel_one_pass
    pages, robots, seen = _inputs(spark)
    out = str(tmp_path / "sched")
    counts = run_crawl_funnel_one_pass(pages, robots, seen, sink=out)
    sched = spark.read.parquet(out)
    assert sched.count() == counts["scheduled"] > 0


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


def test_crawl_schedule_stream_equals_batch(spark, tmp_path):
    """The FULLY stream-native cycle (r8 VERDICT #5): robots verdict,
    per-host delay, worker, and stateful politeness seq all ON the
    stream — one micro-batch must be row-identical to crawl_cycle."""
    import glob
    import shutil

    from wine_label_ocr_spark.streaming.extract_stream import (
        crawl_schedule_stream)

    pages, robots, seen = _inputs(spark)
    want = sorted(map(tuple, crawl_cycle(pages, robots, seen)
                      .select("url", "host", "seq", "worker", "delay_ms",
                              "fetch_offset_ms").collect()))

    src = tmp_path / "pages_src"
    src.mkdir()
    stage = str(tmp_path / "pages_stage")
    pages.coalesce(1).write.parquet(stage)
    shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                str(src / "a.parquet"))
    st = spark.readStream.schema("url string, html string") \
        .parquet(str(src))
    q = (crawl_schedule_stream(st, robots, seen)
         .writeStream.format("memory").queryName("css_out")
         .option("checkpointLocation", str(tmp_path / "css_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM css_out").collect()))
    assert got == want


def test_crawl_schedule_stream_seq_continues_across_batches(spark,
                                                            tmp_path):
    """Politeness state survives micro-batches: a host that scheduled k
    URLs in batch 1 continues at seq k+1 (and offset (k)·delay) in
    batch 2 — the streaming-native politeness contract the per-batch
    foreachBatch planner cannot give."""
    import glob
    import shutil

    from wine_label_ocr_spark.streaming.extract_stream import (
        crawl_schedule_stream)

    robots = spark.createDataFrame(
        [("s.com", "User-agent: *\nAllow: /\nCrawl-delay: 2")],
        "host string, robots_txt string")

    def batch_pages(tag):
        return spark.createDataFrame(
            [(f"https://src{tag}.com/",
              f'<a href="https://s.com/{tag}/a">a</a>'
              f'<a href="https://s.com/{tag}/b">b</a>')],
            "url string, html string")

    src = tmp_path / "pages_src"
    src.mkdir()
    for tag in ("one", "two"):
        stage = str(tmp_path / f"stage_{tag}")
        batch_pages(tag).coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                    str(src / f"{tag}.parquet"))
    st = spark.readStream.schema("url string, html string") \
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (crawl_schedule_stream(st, robots)
         .writeStream.format("memory").queryName("css_seq")
         .option("checkpointLocation", str(tmp_path / "css_ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["url"]: r for r in
            spark.sql("SELECT * FROM css_seq").collect()}
    assert len(rows) == 4
    seqs = sorted(r["seq"] for r in rows.values())
    assert seqs == [1, 2, 3, 4]  # one continuous per-host sequence
    assert all(r["fetch_offset_ms"] == (r["seq"] - 1) * 2000
               for r in rows.values())
    # within each batch urls sort ascending; batches keep arrival order
    by_seq = sorted(rows.values(), key=lambda r: r["seq"])
    batch1 = {by_seq[0]["url"], by_seq[1]["url"]}
    assert batch1 == {"https://s.com/one/a", "https://s.com/one/b"} or \
        batch1 == {"https://s.com/two/a", "https://s.com/two/b"}


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


def test_parse_sitemap_urls_formats():
    """Pure-function coverage: namespaced urlset, sitemapindex,
    plain-text format, gzip, entity unescape, tolerance."""
    import gzip

    from wine_label_ocr_spark.operators.sitemap import parse_sitemap_urls

    xml = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
           '  <url><loc> https://a.com/p1 </loc>'
           '<lastmod>2024-01-02</lastmod></url>\n'
           '  <url><loc>https://a.com/p?a=1&amp;b=2</loc></url>\n'
           '  <url><lastmod>2024-01-01</lastmod></url>\n'  # no loc: skip
           '</urlset>')
    assert parse_sitemap_urls(xml) == [
        ("https://a.com/p1", "2024-01-02", "url"),
        ("https://a.com/p?a=1&b=2", None, "url"),  # entity unescaped
    ]
    # namespace-free spelling parses identically
    assert parse_sitemap_urls(
        "<urlset><url><loc>https://a.com/x</loc></url></urlset>") == [
        ("https://a.com/x", None, "url")]
    # sitemapindex children come back kind='sitemap'
    idx = ('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
           'sitemap/0.9"><sitemap><loc>https://a.com/sm1.xml.gz</loc>'
           '<lastmod>2024-02-03</lastmod></sitemap></sitemapindex>')
    assert parse_sitemap_urls(idx) == [
        ("https://a.com/sm1.xml.gz", "2024-02-03", "sitemap")]
    # plain-text format: one URL per line, junk lines skipped
    assert parse_sitemap_urls(
        "https://t.com/1\nnot a url\n  HTTPS://t.com/2  \n") == [
        ("https://t.com/1", None, "url"), ("HTTPS://t.com/2", None, "url")]
    # gzip of the XML decodes transparently (bytes payload)
    assert parse_sitemap_urls(gzip.compress(xml.encode())) == \
        parse_sitemap_urls(xml)
    # tolerance: malformed XML -> text fallback finds embedded nothing;
    # wrong root, empty, None, binary junk all yield []
    assert parse_sitemap_urls("<urlset><url><loc>x</loc>") == []
    assert parse_sitemap_urls("<rss><item/></rss>") == []
    assert parse_sitemap_urls("") == []
    assert parse_sitemap_urls(None) == []
    assert parse_sitemap_urls(b"\x1f\x8b\x00garbage") == []


def test_parse_sitemap_op_and_crawl_seeding(spark):
    """Spark op explode shape + the crawl_cycle(sitemaps=...) contract:
    robots-DECLARED sitemap locs enter the candidate set (and then the
    seen anti-join + robots gate + scheduler); undeclared sitemap
    payloads inject nothing."""
    from wine_label_ocr_spark.operators.sitemap import parse_sitemap

    pages, robots, seen = _inputs(spark)
    robots2 = spark.createDataFrame(
        [("b.com", "User-agent: *\nDisallow: /priv/\nCrawl-delay: 2\n"
          "Sitemap: https://b.com/sm.xml\n")],
        "host string, robots_txt string")
    sm_declared = ("<urlset>"
                   "<url><loc>https://b.com/sm/new</loc></url>"
                   "<url><loc>https://b.com/priv/sm</loc></url>"  # robots-blocked
                   "<url><loc>https://b.com/x/1</loc></url>"      # dup of outlink
                   "<url><loc>https://seen.com/old</loc></url>"   # already seen
                   "</urlset>")
    sm_rogue = "<urlset><url><loc>https://evil.com/p</loc></url></urlset>"
    sitemaps = spark.createDataFrame(
        [("https://b.com/sm.xml", sm_declared),
         ("https://b.com/other.xml", sm_rogue)],
        "url string, sitemap_xml string")
    # op shape
    rows = parse_sitemap(sitemaps).collect()
    assert {(r["sitemap_url"], r["loc"], r["kind"]) for r in rows} == {
        ("https://b.com/sm.xml", "https://b.com/sm/new", "url"),
        ("https://b.com/sm.xml", "https://b.com/priv/sm", "url"),
        ("https://b.com/sm.xml", "https://b.com/x/1", "url"),
        ("https://b.com/sm.xml", "https://seen.com/old", "url"),
        ("https://b.com/other.xml", "https://evil.com/p", "url")}
    # composed: only the declared sitemap's allowed+unseen loc appears,
    # alongside the outlink-derived schedule; evil.com never shows
    sched = {r["url"]: r for r in
             crawl_cycle(pages, robots2, seen, sitemaps=sitemaps).collect()}
    assert "https://b.com/sm/new" in sched
    assert sched["https://b.com/sm/new"]["delay_ms"] == 2000
    assert "https://b.com/priv/sm" not in sched     # robots gate
    assert "https://seen.com/old" not in sched      # seen anti-join
    assert "https://evil.com/p" not in sched        # undeclared payload
    # the sitemap-less call is byte-identical to before (dup of x/1
    # collapses; candidate set unchanged)
    base = {r["url"] for r in crawl_cycle(pages, robots2, seen).collect()}
    assert {u for u in sched} == base | {"https://b.com/sm/new"}


def test_durable_seen_store_restart_loop(spark, tmp_path):
    """TWO crawl cycles driven through the durable SeenUrlStore with a
    simulated restart between them (fresh session state, store re-read
    from disk): schedules must be identical to the in-memory
    seen_url_fps loop, the second cycle's store commit must write only
    NEW fingerprints (MERGE dedup), and a range-bounded read must
    prune files via the manifest's fp footer stats."""
    from wine_label_ocr_spark.plans.crawl import SeenUrlStore

    pages, robots, seen0_mem = _inputs(spark)
    root = str(tmp_path / "seen_store")

    # seed the store with the same pre-seen URL the in-memory loop has
    store = SeenUrlStore(root)
    store.record_fetched(
        spark, spark.createDataFrame([("https://seen.com/old",)],
                                     "url string"))

    # cycle 1: store-backed == in-memory
    mem1 = {r["url"]: (r["seq"], r["delay_ms"])
            for r in crawl_cycle(pages, robots, seen0_mem).collect()}
    dur1_df = crawl_cycle(pages, robots, store.read(spark))
    dur1 = {r["url"]: (r["seq"], r["delay_ms"]) for r in dur1_df.collect()}
    assert dur1 == mem1 and len(dur1) == 4

    # "fetch" the schedule, commit; MERGE dedup: re-committing the same
    # URLs plus one new one writes exactly one new fp
    store.record_fetched(spark, dur1_df.select("url"))
    n_before = store.read(spark).count()
    store.record_fetched(
        spark, spark.createDataFrame(
            [(u,) for u in mem1] + [("https://fresh.com/n",)],
            "url string"))
    assert store.read(spark).count() == n_before + 1

    # simulated restart: new session state + a fresh store handle on
    # the same root — nothing carried over in memory
    spark2 = spark.newSession()
    store2 = SeenUrlStore(root)
    mem_seen2 = (seen0_mem.unionByName(seen_url_fps(dur1_df.select("url")))
                 .unionByName(seen_url_fps(spark.createDataFrame(
                     [("https://fresh.com/n",)], "url string")))
                 .distinct())
    pages2, robots2, _ = _inputs(spark2)
    mem2 = {r["url"] for r in
            crawl_cycle(pages2, robots2, mem_seen2).collect()}
    dur2 = {r["url"] for r in
            crawl_cycle(pages2, robots2, store2.read(spark2)).collect()}
    assert dur2 == mem2 == set()  # everything fetched -> empty frontier

    # expansion still schedules: a page linking somewhere new
    pages3 = spark2.createDataFrame(
        [("https://a.com/dir/p9", '<a href="https://b.com/x/new9">n</a>')],
        "url string, html string")
    dur3 = {r["url"] for r in
            crawl_cycle(pages3, robots2, store2.read(spark2)).collect()}
    assert dur3 == {"https://b.com/x/new9"}

    # file-stats pruning: a point read on one fp touches fewer data
    # files than the store holds (files are range-ordered on fp)
    from wine_label_ocr_spark.operators.dedupe import _hash64
    fp = (spark2.createDataFrame([("https://fresh.com/n",)], "url string")
          .select(_hash64(F.col("url"), 0, False).alias("fp"))
          .head()["fp"])
    pruned = store2.read(spark2, key_between=(fp, fp))
    assert pruned.filter(F.col("fp") == fp).count() == 1
    assert (len(pruned.inputFiles())
            < len(store2.table.current_files()))
